import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from easyhec_tpu.config import load_config
from easyhec_tpu.trainer.offline import build_runtime
from easyhec_tpu.data import load_calib_dataset
from easyhec_tpu.models.calib import calibrate
from easyhec_tpu.geometry import se3

cfg = load_config("configs/franka_offline.yaml",
    ["model.use_links=[panda_link0,panda_link1,panda_link2,panda_link3,panda_link4,panda_link5,panda_link6,panda_link7,panda_hand,panda_leftfinger,panda_rightfinger]",
     "model.decimate_voxel=0.01", "model.H=120", "model.W=160", "render.tile_h=16", "render.tile_w=32", "render.capacity=256"])
rt = build_runtime(cfg)
batch = load_calib_dataset(cfg.dataset.data_dir, rt.chain, rt.link_names)
T0 = np.loadtxt("/tmp/franka_ms_T.txt").astype(np.float32) if pathlib.Path("/tmp/franka_ms_T.txt").exists() else np.loadtxt("runs/franka_offline/Tc_c2b.txt").astype(np.float32)
dof0 = np.asarray(se3.log(jnp.asarray(T0)))
lp = jnp.asarray(batch.link_poses)

@jax.jit
def render_one(T, lp1):
    return rt.renderer.silhouette(jnp.asarray(T), lp1, jnp.asarray(batch.K))

# IoU of mask i against render with qpos j (at current pose, no re-opt)
print("IoU(mask_i, render_qpos_j); rows=mask i, cols=qpos j")
M = np.zeros((10,10))
for j in range(10):
    sil = np.asarray(render_one(T0, lp[j])) > 0.5
    for i in range(10):
        m = batch.masks[i] > 0.5
        M[i, j] = (sil&m).sum()/max((sil|m).sum(),1)
np.set_printoptions(linewidth=200)
print((M*100).round(0))
print("argmax per mask:", M.argmax(1))
