import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax
if os.environ.get("DRIVE_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
from orbslam3_tpu.utils import enable_compile_cache
enable_compile_cache()
import numpy as np
import jax
import jax.numpy as jnp
from orbslam3_tpu.ops import lie, ransac

rng = np.random.default_rng(0)
n = 300
# PLANAR scene
pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 5.0)], -1)
R_true = np.asarray(lie.exp_so3(jnp.asarray([0.03, -0.12, 0.02], jnp.float32)))
t_true = np.array([0.6, 0.05, 0.1], np.float32)
p1 = pts[:, :2] / pts[:, 2:3]
pc2 = (R_true @ pts.T).T + t_true
p2 = pc2[:, :2] / pc2[:, 2:3]
p1 += rng.normal(0, 0.5 / 450, p1.shape)
p2 += rng.normal(0, 0.5 / 450, p2.shape)
n_out = int(n * 0.15)
idx = rng.choice(n, n_out, replace=False)
p2[idx] += rng.uniform(0.05, 0.3, (n_out, 2)) * np.sign(rng.normal(size=(n_out, 2)))

p1j = jnp.asarray(p1, jnp.float32); p2j = jnp.asarray(p2, jnp.float32)
valid = jnp.ones(n, bool)
sigma_norm = 1.0 / 450
inv_s2 = 1.0 / sigma_norm**2
th_h = ransac.TH_H_PX / inv_s2
th_sc = ransac.TH_SCORE_PX / inv_s2

# True H: for plane z=5 (n=[0,0,1], d=5): H = R + t n^T / d
H_true = R_true + np.outer(t_true, [0, 0, 1.0 / 5.0])
sc, inl = ransac._score_homography(jnp.asarray(H_true, jnp.float32), p1j, p2j, valid, th_h, th_sc)
print("true H score:", float(sc), "inliers:", int(inl.sum()))

# refit on true inliers then decompose
H = ransac._dlt_homography(p1j, p2j, weights=inl.astype(jnp.float32))
sc2, inl2 = ransac._score_homography(H, p1j, p2j, valid, th_h, th_sc)
print("refit H score:", float(sc2), "inliers:", int(inl2.sum()))
Rs, ts = ransac._decompose_H(H)
th_rt = 4.0 * sigma_norm**2
res = jax.vmap(lambda R, t: ransac._check_rt(R, t, p1j, p2j, inl2, th_rt))(Rs, ts)
for i in range(8):
    rot_err = np.linalg.norm(np.asarray(lie.log_so3(jnp.asarray(R_true.T) @ Rs[i])))
    print(f"hyp {i}: n_good={int(res[0][i])} rot_err={rot_err:.4f}")

out = ransac.reconstruct_two_views(p1j, p2j, valid, jax.random.PRNGKey(0), sigma_norm=sigma_norm)
print("full: success:", bool(out.success), "usedH:", bool(out.used_homography),
      "n_good best:", int(np.asarray(out.is_good).sum()))
