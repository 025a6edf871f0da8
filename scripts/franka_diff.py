import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np, cv2
from easyhec_tpu.config import load_config
from easyhec_tpu.trainer.offline import build_runtime
from easyhec_tpu.data import load_calib_dataset
from easyhec_tpu.geometry import se3

cfg = load_config("configs/franka_offline.yaml",
    ["model.use_links=[panda_link0,panda_link1,panda_link2,panda_link3,panda_link4,panda_link5,panda_link6,panda_link7,panda_hand,panda_leftfinger,panda_rightfinger]",
     "model.decimate_voxel=0.004"])
rt = build_runtime(cfg)
batch = load_calib_dataset(cfg.dataset.data_dir, rt.chain, rt.link_names)
T = np.loadtxt("runs/franka_offline/Tc_c2b.txt").astype(np.float32)

@jax.jit
def render(T):
    return rt.renderer.silhouette(jnp.asarray(T), jnp.asarray(batch.link_poses), jnp.asarray(batch.K))
sil = np.asarray(render(T))
for fi in [0, 7]:
    r = sil[fi] > 0.5; m = batch.masks[fi] > 0.5
    img = np.zeros((480, 640, 3), np.uint8)
    img[m & r] = (0, 180, 0)      # both: green
    img[m & ~r] = (0, 0, 230)     # mask only: red (BGR)
    img[~m & r] = (230, 100, 0)   # render only: blue
    cv2.imwrite(f"/tmp/diff_{fi}.png", img)
    prec = (r&m).sum()/max(r.sum(),1); rec = (r&m).sum()/max(m.sum(),1)
    print(f"frame {fi}: precision {prec:.3f} recall {rec:.3f}")
