import jax, time
import jax.numpy as jnp
import numpy as np
from priordepth_gaussiansplatting_tpu.ops import binning as B
from priordepth_gaussiansplatting_tpu.ops.projection import ProjectedGaussians
import sys; sys.path.insert(0, "/root/repo"); from tools.segred_probe import xla_segment_reduce

rng = np.random.default_rng(0)
n = 1_000_000; w, h = 1296, 840
mean2d = np.stack([rng.uniform(-50, w+50, n), rng.uniform(-50, h+50, n)], -1).astype(np.float32)
radius = rng.integers(0, 40, n).astype(np.int32); radius[rng.random(n) < 0.3] = 0
depth = rng.uniform(0.1, 100, n).astype(np.float32); depth[radius == 0] = np.inf
proj = ProjectedGaussians(mean2d=jnp.asarray(mean2d), conic=jnp.ones((n,3),jnp.float32),
    opacity=jnp.full((n,),0.5,jnp.float32), rgb=jnp.ones((n,3),jnp.float32),
    depth=jnp.asarray(depth), invdepth=jnp.asarray(1.0/depth), radius=jnp.asarray(radius))
cap = 1 << 23
t0 = time.perf_counter()
binned = jax.jit(B.bin_gaussians, static_argnames=("width","height","pair_capacity"))(proj, w, h, cap)
jax.block_until_ready(binned)
print("bin compile+run:", time.perf_counter()-t0, flush=True)
d_np = rng.standard_normal((B.ATTR_ROWS, cap)).astype(np.float32)
d_pairs = jnp.asarray(d_np)

f_xla = jax.jit(lambda d: xla_segment_reduce(d, binned, n))
f_pl = jax.jit(lambda d: B.segment_reduce(d, binned, n))
a = np.asarray(f_xla(d_pairs)); print("xla done", flush=True)
b = np.asarray(f_pl(d_pairs)); print("pallas done", flush=True)

offs = np.asarray(binned.seg_offsets); cnts = np.asarray(binned.seg_counts)
npairs = int(binned.num_pairs)
d64 = d_np[:, :npairs].astype(np.float64)
c64 = np.concatenate([np.zeros((d64.shape[0],1)), np.cumsum(d64, axis=1)], axis=1)
lo = np.clip(offs, 0, npairs); hi = np.clip(offs + cnts, 0, npairs)
truth = c64[:, hi] - c64[:, lo]
print("max |xla - truth|   :", np.abs(a - truth).max(), flush=True)
print("max |pallas - truth|:", np.abs(b - truth).max(), flush=True)

for name, f in [("xla", f_xla), ("pallas", f_pl)]:
    jax.block_until_ready(f(d_pairs))
    t0 = time.perf_counter()
    for _ in range(20): out = f(d_pairs)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/20*1e3:.3f} ms", flush=True)
