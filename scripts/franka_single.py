import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np, time
from easyhec_tpu.config import load_config
from easyhec_tpu.trainer.offline import build_runtime
from easyhec_tpu.data import load_calib_dataset
from easyhec_tpu.models.calib import calibrate
from easyhec_tpu.geometry import se3

cfg = load_config("configs/franka_offline.yaml",
    ["model.use_links=[panda_link0,panda_link1,panda_link2,panda_link3,panda_link4,panda_link5,panda_link6,panda_link7,panda_hand,panda_leftfinger,panda_rightfinger]",
     "model.decimate_voxel=0.004"])
rt = build_runtime(cfg)
batch = load_calib_dataset(cfg.dataset.data_dir, rt.chain, rt.link_names)
start = np.loadtxt("runs/franka_offline/Tc_c2b.txt").astype(np.float32)
dof0 = np.asarray(se3.log(jnp.asarray(start)))

@jax.jit
def render1(T, lp):
    return rt.renderer.silhouette(jnp.asarray(T), lp, jnp.asarray(batch.K))

for fi in [0, 2, 7]:
    res = calibrate(dof0, rt.renderer, batch.link_poses[fi:fi+1], batch.K,
                    batch.masks[fi:fi+1], num_steps=600, max_lr=0.005)
    a = np.asarray(render1(res.Tc_c2b, jnp.asarray(batch.link_poses[fi]))) > 0.5
    b = batch.masks[fi] > 0.5
    iou = (a&b).sum()/max((a|b).sum(),1)
    print(f"frame {fi}: single-frame IoU {iou:.3f} loss {res.losses[0]:.0f}->{res.losses[-1]:.0f}", flush=True)
