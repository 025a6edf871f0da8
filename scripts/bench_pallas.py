import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time, jax, jax.numpy as jnp, numpy as np
from easyhec_tpu.robot import parse_urdf, build_chain, load_link_meshes
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.geometry import se3, camera

model = parse_urdf("/root/reference/assets/xarm7_with_gripper_reduced_dof.urdf")
chain = build_chain(model)
names = [f"link{i}" for i in range(1,8)]
meshes = load_link_meshes(model, link_names=names)
mesh_list = [meshes[n] for n in names]
H, W = 480, 640
r = RobotRenderer(mesh_list, H, W, tile=TileConfig(32, 128, 512, True), mode="tiled")
K = jnp.asarray([[600.0,0,320],[0,600.0,240],[0,0,1]])
Tcam = camera.look_at(jnp.array([1.0,0.7,0.8]), jnp.array([0.,0.,0.3]), jnp.array([0.,0.,1.]))
Tc_c2b = se3.inverse(Tcam)
link_idx = jnp.asarray([chain.link_index(n) for n in names])
B = 10
qs = jax.random.uniform(jax.random.PRNGKey(0), (B, chain.n_dof),
    minval=jnp.asarray(chain.joint_limits[:,0]*0.4), maxval=jnp.asarray(chain.joint_limits[:,1]*0.4))

@jax.jit
def render_all(xi, qs):
    lp = jax.vmap(chain.fk)(qs)[:, link_idx]
    return r.silhouette(se3.exp(xi), lp, K)

@jax.jit
def loss_grad(xi, qs, target):
    def loss(x):
        lp = jax.vmap(chain.fk)(qs)[:, link_idx]
        return jnp.sum((r.silhouette(se3.exp(x), lp, K) - target) ** 2)
    return jax.value_and_grad(loss)(xi)

xi = se3.log(Tc_c2b)
t0=time.time(); imgs = jax.block_until_ready(render_all(xi, qs)); print(f"fwd compile: {time.time()-t0:.0f}s")
t0=time.time(); jax.block_until_ready(render_all(xi, qs)); fwd=time.time()-t0
print(f"fwd steady: {fwd*1e3:.1f} ms -> {B*H*W/fwd/1e6:.0f} Mpix/s")
target = imgs
t0=time.time(); v,g = loss_grad(xi + 0.01, qs, target); jax.block_until_ready(g); print(f"fwd+bwd compile: {time.time()-t0:.0f}s")
t0=time.time(); v,g = loss_grad(xi + 0.01, qs, target); jax.block_until_ready(g); fb=time.time()-t0
print(f"fwd+bwd steady: {fb*1e3:.1f} ms -> {B*H*W/fb/1e6:.0f} Mpix/s")
print("loss:", float(v), "grad finite:", bool(jnp.all(jnp.isfinite(g))), "grad:", np.asarray(g).round(4))
r2 = RobotRenderer(mesh_list, H, W, tile=TileConfig(32, 128, 512, False), mode="tiled")
@jax.jit
def render_xla(xi, qs):
    lp = jax.vmap(chain.fk)(qs)[:, link_idx]
    return r2.silhouette(se3.exp(xi), lp, K)
imgs2 = jax.block_until_ready(render_xla(xi, qs))
print("pallas vs xla max diff:", float(jnp.abs(imgs-imgs2).max()))
