import sys; sys.path.insert(0, "/root/repo")
import numpy as np
from taseg_tpu.data.synthetic import synthetic_scan

rng = np.random.default_rng(0)
pts, lbl = synthetic_scan(rng, 120_000)
print("labels:", np.bincount(lbl, minlength=20)[[1,9,13,15,18]])
vox0 = np.unique(np.floor(pts[:, :3] / 0.05).astype(np.int64), axis=0)

def stats(vox, T=256, name=""):
    mn = vox.min(0) - 4
    ex = vox.max(0) - mn + 4
    key = (vox[:,2]-mn[2]) * (ex[0]*ex[1]) + (vox[:,0]-mn[0]) * ex[1] + (vox[:,1]-mn[1])
    key = np.sort(key)
    V = len(key)
    lut = dict(zip(key.tolist(), range(V)))
    n_tiles = (V + T - 1) // T
    counts = []
    band_lo = np.full((3, n_tiles), 2**62); band_hi = np.full((3, n_tiles), -1)
    for dz in (-1,0,1):
        band = dz + 1
        for dy in (-1,0,1):
            for dx in (-1,0,1):
                if dx==dy==dz==0: continue
                delta = dz*(ex[0]*ex[1]) + dx*ex[1] + dy
                m = np.array([lut.get(int(k+delta), -1) for k in key])
                valid = (m >= 0).astype(int)
                counts.append(np.add.reduceat(valid, np.arange(0, V, T)))
                for t in range(n_tiles):
                    mm = m[t*T:(t+1)*T]; mm = mm[mm>=0]
                    if len(mm):
                        band_lo[band,t] = min(band_lo[band,t], mm.min())
                        band_hi[band,t] = max(band_hi[band,t], mm.max())
    c = np.concatenate(counts)
    bw = np.where(band_hi>=0, band_hi-band_lo, 0)
    # coverage with 2-block (512-aligned base at min): covered span = 1024 - min%512
    cov = []
    for b in range(3):
        lo = np.where(band_hi[b]>=0, band_lo[b], 0)
        need = bw[b] + lo % 512
        cov.append((need >= 1024).mean())
    print(f"{name} V={V}: cnt mean={c.mean():.1f} p99={np.percentile(c,99):.0f} p99.9={np.percentile(c,99.9):.0f} max={c.max()}"
          f"  bandwidth p99={np.percentile(bw,99):.0f} max={bw.max()}  frac-tiles-overflowing-1024win: {[f'{x:.4f}' for x in cov]}")

stats(vox0, name="L0")
stats(np.unique(vox0//2, axis=0), name="L1")
stats(np.unique(vox0//4, axis=0), name="L2")
stats(np.unique(vox0//8, axis=0), name="L3")
stats(np.unique(vox0//16, axis=0), name="L4")
