import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np, yaml
from easyhec_tpu.config import load_config
from easyhec_tpu.trainer.offline import build_runtime
from easyhec_tpu.data import load_calib_dataset
from easyhec_tpu.geometry import se3

cfg = load_config("configs/franka_offline.yaml")
rt = build_runtime(cfg)
batch = load_calib_dataset(cfg.dataset.data_dir, rt.chain, rt.link_names)
init = np.asarray(cfg.model.init_Tc_c2b, np.float32)
solved = np.loadtxt("runs/franka_offline/Tc_c2b.txt").astype(np.float32)

@jax.jit
def render(T):
    return rt.renderer.silhouette(jnp.asarray(T), jnp.asarray(batch.link_poses), jnp.asarray(batch.K))

def iou(sil, masks):
    a = np.asarray(sil) > 0.5; b = masks > 0.5
    return [(float((x&y).sum()/max((x|y).sum(),1))) for x,y in zip(a,b)]

sil_i = render(init); sil_s = render(solved)
print("init IoU:", np.round(iou(sil_i, batch.masks),3))
print("solved IoU:", np.round(iou(sil_s, batch.masks),3))
# frame 0 overlay ascii
r0 = np.asarray(sil_s[0]) > 0.5; m0 = batch.masks[0] > 0.5
for y in range(0, 480, 20):
    row = ""
    for x in range(0, 640, 10):
        rr = r0[y:y+20, x:x+10].any(); mm = m0[y:y+20, x:x+10].any()
        row += "#" if (rr and mm) else ("R" if rr else ("M" if mm else "."))
    print(row)
