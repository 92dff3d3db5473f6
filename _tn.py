import numpy as np
from claymore_tpu import native
from claymore_tpu.io import bgeo

lib = native.load()
print("native lib:", "loaded" if lib else "UNAVAILABLE")
rng = np.random.default_rng(0)
pos = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
attrs = {"J": rng.uniform(0.5, 1.5, 5000).astype(np.float32)}
ok = native.write_bgeo_native("/tmp/native.bgeo", pos, attrs)
print("sync write:", ok)
rpos, rattrs = bgeo.read_bgeo("/tmp/native.bgeo")
print("roundtrip pos exact:", np.array_equal(rpos, pos), "J exact:", np.array_equal(rattrs["J"], attrs["J"]))
ok = native.write_bgeo_native("/tmp/native2.bgeo", pos, attrs, asynchronous=True)
native.flush_native()
r2, _ = bgeo.read_bgeo("/tmp/native2.bgeo")
print("async write ok:", ok, np.array_equal(r2, pos))
# sample elimination: 10k candidates -> 2k blue-noise
cands = rng.uniform(0, 1, (10000, 3)).astype(np.float32)
kept = native.sample_elimination_native(cands, 2000)
print("elim kept:", None if kept is None else len(kept))
if kept is not None:
    pts = cands[kept]
    from scipy.spatial import cKDTree  # probably unavailable; fallback below
