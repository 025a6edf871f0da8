import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np, optax, time
from easyhec_tpu.config import load_config
from easyhec_tpu.trainer.offline import build_runtime
from easyhec_tpu.data import load_calib_dataset
from easyhec_tpu.models.calib import downscale_K, downscale_mask, calibrate
from easyhec_tpu.geometry import se3
from easyhec_tpu.render import RobotRenderer, TileConfig

cfg = load_config("configs/franka_offline.yaml",
    ["model.use_links=[panda_link0,panda_link1,panda_link2,panda_link3,panda_link4,panda_link5,panda_link6,panda_link7,panda_hand,panda_leftfinger,panda_rightfinger]",
     "model.decimate_voxel=0.006"])
rt = build_runtime(cfg)
batch = load_calib_dataset(cfg.dataset.data_dir, rt.chain, rt.link_names)
init = np.asarray(cfg.model.init_Tc_c2b, np.float32)
dof0 = np.asarray(se3.log(jnp.asarray(init)))

# coarse renderer at 1/4 res
s = 4
meshes = rt.renderer  # reuse packed? simpler: rebuild
from easyhec_tpu.trainer.offline import build_runtime as _br
cfg4 = load_config("configs/franka_offline.yaml",
    ["model.use_links=[panda_link0,panda_link1,panda_link2,panda_link3,panda_link4,panda_link5,panda_link6,panda_link7,panda_hand,panda_leftfinger,panda_rightfinger]",
     "model.decimate_voxel=0.006", f"model.H={480//s}", f"model.W={640//s}",
     "render.tile_h=16","render.tile_w=32","render.capacity=512"])
rt4 = _br(cfg4)
K4 = jnp.asarray(downscale_K(batch.K, s))
m4 = jnp.asarray(downscale_mask(batch.masks, s))
lp = jnp.asarray(batch.link_poses)

def loss4(dof):
    sil = rt4.renderer.silhouette(se3.exp(dof), lp, K4)
    return jnp.mean(jnp.sum((sil - m4)**2, axis=(-2,-1)))

opt = optax.adam(0.01)
N = 64
key = jax.random.PRNGKey(0)
noise = jax.random.normal(key, (N, 6)) * jnp.asarray([0.08,0.08,0.08,0.06,0.06,0.06])
dofs = jnp.asarray(dof0)[None] + noise.at[0].set(0.0)

@jax.jit
def multistep(dofs, states):
    def one(dof, state):
        l, g = jax.value_and_grad(loss4)(dof)
        u, state = opt.update(g, state, dof)
        return dof + u, state, l
    def body(c, _):
        d, st = c
        d, st, l = jax.vmap(one)(d, st)
        return (d, st), l
    (d, st), ls = jax.lax.scan(body, (dofs, states), None, length=20)
    return d, st, ls[-1]

states = jax.vmap(opt.init)(dofs)
t0 = time.time()
for i in range(15):
    dofs, states, ls = multistep(dofs, states)
    if i % 5 == 0:
        print(f"round {i}: best {float(ls.min()):.0f} med {float(jnp.median(ls)):.0f}", flush=True)
print(f"coarse {time.time()-t0:.0f}s")
best = int(jnp.argmin(ls))
print("best idx", best, "loss", float(ls[best]))
# refine best at full res
res = calibrate(np.asarray(dofs[best]), rt.renderer, batch.link_poses, batch.K, batch.masks,
                num_steps=600, max_lr=0.003)
@jax.jit
def render(T):
    return rt.renderer.silhouette(jnp.asarray(T), lp, jnp.asarray(batch.K))
a = np.asarray(render(res.Tc_c2b)) > 0.5; b = batch.masks > 0.5
ious = [(x&y).sum()/max((x|y).sum(),1) for x,y in zip(a,b)]
print("refined loss", res.losses[-1], "mIoU", round(float(np.mean(ious)),3))
np.savetxt("/tmp/franka_ms_T.txt", res.Tc_c2b)
