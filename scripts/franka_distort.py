import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np, optax, time
from easyhec_tpu.config import load_config
from easyhec_tpu.trainer.offline import build_runtime
from easyhec_tpu.data import load_calib_dataset
from easyhec_tpu.geometry import se3
from easyhec_tpu.render.projection import transform_verts, Triangles2D
from easyhec_tpu.render.tiled import silhouette_tiled

cfg = load_config("configs/franka_offline.yaml",
    ["model.use_links=[panda_link0,panda_link1,panda_link2,panda_link3,panda_link4,panda_link5,panda_link6,panda_link7,panda_hand,panda_leftfinger,panda_rightfinger]",
     "model.decimate_voxel=0.004"])
rt = build_runtime(cfg)
r = rt.renderer
batch = load_calib_dataset(cfg.dataset.data_dir, rt.chain, rt.link_names)
K = jnp.asarray(batch.K); lp = jnp.asarray(batch.link_poses); masks = jnp.asarray(batch.masks)
T0 = np.loadtxt("runs/franka_offline/Tc_c2b.txt").astype(np.float32)
dof0 = jnp.asarray(se3.log(jnp.asarray(T0)))

def project_distorted(verts_cam, K, dist):
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    x = verts_cam[..., 0] / verts_cam[..., 2]
    y = verts_cam[..., 1] / verts_cam[..., 2]
    r2 = x*x + y*y
    f = 1.0 + k1*r2 + k2*r2*r2
    xd = x*f + 2*p1*x*y + p2*(r2 + 2*x*x)
    yd = y*f + p1*(r2 + 2*y*y) + 2*p2*x*y
    u = K[0,0]*xd + K[0,2]
    v = K[1,1]*yd + K[1,2]
    return jnp.stack([u, v], -1), verts_cam[..., 2]

def render(dof, dist):
    Tcl = r.camera_link_poses(se3.exp(dof), lp)
    vc = transform_verts(r.vertices, r.vert_link_id, Tcl)
    uv, z = project_distorted(vc, K, dist)
    tri_uv = jnp.take(uv, r.faces, axis=-2)
    tri_z = jnp.take(z, r.faces, axis=-1)
    valid = jnp.all((tri_z > 0.001) & (tri_z < 10.0), axis=-1)
    tris = Triangles2D(uv=tri_uv, z=tri_z, valid=valid)
    return silhouette_tiled(tris, r.H, r.W, r.tile)

def loss_fn(params):
    sil = render(params["dof"], params["dist"])
    return jnp.mean(jnp.sum((sil - masks)**2, axis=(-2,-1)))

opt = optax.multi_transform(
    {"dof": optax.adam(3e-3), "dist": optax.adam(3e-3)},
    {"dof": "dof", "dist": "dist"})
params = {"dof": dof0, "dist": jnp.zeros(4)}
state = opt.init(params)

@jax.jit
def steps(params, state, n=25):
    def body(c, _):
        p, s = c
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return (optax.apply_updates(p, u), s), l
    (p, s), ls = jax.lax.scan(body, (params, state), None, length=25)
    return p, s, ls

t0=time.time()
for i in range(40):
    params, state, ls = steps(params, state)
    if i % 8 == 0:
        print(f"step {i*25}: loss {float(ls[-1]):.0f} dist {np.asarray(params['dist']).round(4)}", flush=True)
print(f"({time.time()-t0:.0f}s)")
sil = np.asarray(render(params["dof"], params["dist"]))
a = sil > 0.5; b = np.asarray(masks) > 0.5
ious = [(x&y).sum()/max((x|y).sum(),1) for x,y in zip(a,b)]
print("final dist:", np.asarray(params["dist"]).round(4), "mIoU:", round(float(np.mean(ious)),3))
np.savetxt("/tmp/franka_dist_T.txt", np.asarray(se3.exp(params["dof"])))
