import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from easyhec_tpu.config import load_config
from easyhec_tpu.trainer.offline import build_runtime
from easyhec_tpu.data import load_calib_dataset
from easyhec_tpu.models.calib import calibrate
from easyhec_tpu.geometry import se3

cfg = load_config("configs/franka_offline.yaml")
rt = build_runtime(cfg)
batch = load_calib_dataset(cfg.dataset.data_dir, rt.chain, rt.link_names)
init = np.asarray(cfg.model.init_Tc_c2b, np.float32)
init_dof = np.asarray(se3.log(jnp.asarray(init)))

@jax.jit
def render(T):
    return rt.renderer.silhouette(jnp.asarray(T), jnp.asarray(batch.link_poses), jnp.asarray(batch.K))

def miou(T):
    a = np.asarray(render(T)) > 0.5; b = batch.masks > 0.5
    return float(np.mean([(x&y).sum()/max((x|y).sum(),1) for x,y in zip(a,b)]))

import itertools, time
name, steps, lr, sharp = sys.argv[1], int(sys.argv[2]), float(sys.argv[3]), float(sys.argv[4])
start = np.loadtxt("runs/franka_offline/Tc_c2b.txt").astype(np.float32) if name=="cont" else init
dof0 = np.asarray(se3.log(jnp.asarray(start)))
t0=time.time()
res = calibrate(dof0, rt.renderer, batch.link_poses, batch.K, batch.masks,
                num_steps=steps, max_lr=lr, sharpness=sharp,
                robust_delta=cfg.solver.robust_delta)
print(f"{name}: steps={steps} lr={lr} sharp={sharp} loss {res.losses[0]:.0f}->{res.losses[-1]:.0f} "
      f"mIoU={miou(res.Tc_c2b):.3f} ({time.time()-t0:.0f}s)")
