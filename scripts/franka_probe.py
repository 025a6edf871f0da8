import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from easyhec_tpu.robot import parse_urdf, build_chain, load_link_meshes
from easyhec_tpu.render import RobotRenderer, TileConfig
from easyhec_tpu.geometry import se3
from easyhec_tpu.data import load_calib_dataset
import yaml

cfg = yaml.safe_load(open("configs/franka_offline.yaml"))
model = parse_urdf(cfg["model"]["urdf_path"])
chain = build_chain(model)
links = cfg["model"]["use_links"]
meshes = load_link_meshes(model, link_names=links)
mesh_list = [meshes[n] for n in links]
print("total tris:", sum(m.n_faces for m in mesh_list), flush=True)
cap = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 0
H, W = 480, 640
r = RobotRenderer(mesh_list, H, W, tile=TileConfig(32, 128, cap))
batch = load_calib_dataset(cfg["dataset"]["data_dir"], chain, links)
print("frames:", batch.n_frames, flush=True)
init = np.asarray(cfg["model"]["init_Tc_c2b"], np.float32)
dof = se3.log(jnp.asarray(init))
lp = jnp.asarray(batch.link_poses); K = jnp.asarray(batch.K); masks = jnp.asarray(batch.masks)

@jax.jit
def fwd(dof):
    from easyhec_tpu.render.tiled import silhouette_tiled
    sil, ov = r.silhouette(se3.exp(dof), lp, K), None
    return sil

t0=time.time(); sil = jax.block_until_ready(fwd(dof)); print(f"fwd ok {time.time()-t0:.0f}s cov={float((sil>0.5).mean()):.4f}", flush=True)

# overflow check
from easyhec_tpu.render.projection import setup_triangles, transform_verts
from easyhec_tpu.render.tiled import bin_triangles, TileConfig as TC
@jax.jit
def check_overflow(dof):
    Tcl = r.camera_link_poses(se3.exp(dof), lp[0])
    tris = r._triangles(Tcl, K)
    ids, counts, ov = bin_triangles(tris, H, W, TC(32,128,cap))
    return counts.max(), ov
cmax, ov = check_overflow(dof)
print("max tile count:", int(cmax), "overflow:", bool(ov), flush=True)

if steps:
    from easyhec_tpu.models.calib import calibrate
    t0=time.time()
    res = calibrate(np.asarray(dof), r, batch.link_poses, batch.K, batch.masks,
                    num_steps=steps, Tc_c2b_gt=None)
    print(f"{steps} steps ok in {time.time()-t0:.0f}s loss {res.losses[0]:.1f}->{res.losses[-1]:.1f}", flush=True)
