import sys; sys.path.insert(0, "/root/repo")
import numpy as np
from taseg_tpu.data.synthetic import synthetic_scan

rng = np.random.default_rng(0)
pts, _ = synthetic_scan(rng, 120_000)
vox0 = np.unique(np.floor(pts[:, :3] / 0.05).astype(np.int64), axis=0)

def stats(vox, T=256, name="", aligned_planes=False):
    mn = vox.min(0) - 4
    ex = vox.max(0) - mn + 4
    z = vox[:,2]-mn[2]; x = vox[:,0]-mn[0]; y = vox[:,1]-mn[1]
    key = z * (ex[0]*ex[1]) + x * ex[1] + y
    key = np.sort(key)
    V = len(key)
    if aligned_planes:
        # pad so each z-plane starts at a tile boundary
        plane = key // (ex[0]*ex[1])
        out, cur = [], 0
        padded_pos = np.empty(V, np.int64)
        prev_plane = -1
        for i in range(V):
            if key[i]//(ex[0]*ex[1]) != prev_plane:
                cur = ((cur + T - 1)//T)*T
                prev_plane = key[i]//(ex[0]*ex[1])
            padded_pos[i] = cur; cur += 1
        Vp = ((cur + T - 1)//T)*T
        pos_of = dict(zip(key.tolist(), padded_pos.tolist()))
        positions = padded_pos
        n_tiles = Vp // T
    else:
        pos_of = dict(zip(key.tolist(), range(V)))
        positions = np.arange(V)
        n_tiles = (V + T - 1)//T
        Vp = V
    # per (band, tile) window width; overflow entries at various W
    total_entries = 0
    ov = {384: 0, 512: 0, 768: 0, 1024: 0}
    widths = []
    tile_of = positions // T
    for dz in (-1,0,1):
        band_min = np.full(n_tiles, 1<<62); band_max = np.full(n_tiles, -1)
        matches = []  # (tile, pos)
        for dy in (-1,0,1):
            for dx in (-1,0,1):
                if dx==dy==dz==0: continue
                delta = dz*(ex[0]*ex[1]) + dx*ex[1] + dy
                for i in range(V):
                    m = pos_of.get(int(key[i]+delta), -1)
                    if m >= 0:
                        t = tile_of[i]
                        matches.append((t, m))
                        if m < band_min[t]: band_min[t] = m
                        if m > band_max[t]: band_max[t] = m
        total_entries += len(matches)
        for (t, m) in matches:
            rel = m - band_min[t]
            for W in ov:
                if rel >= W - 63:  # 64-aligned base slack
                    ov[W] += 1
        w = np.where(band_max>=0, band_max-band_min, 0)
        widths.append(w)
    w = np.concatenate(widths)
    print(f"{name} V={V} Vp={Vp}: band-width p50={np.percentile(w,50):.0f} p90={np.percentile(w,90):.0f} "
          f"p99={np.percentile(w,99):.0f}  entries={total_entries} "
          f"ov-frac: " + " ".join(f"W{W}:{ov[W]/total_entries:.5f}" for W in sorted(ov)))

stats(vox0, name="L0 raw")
stats(vox0, name="L0 plane-pad", aligned_planes=True)
v1 = np.unique(vox0//2, axis=0)
stats(v1, name="L1 plane-pad", aligned_planes=True)
v3 = np.unique(vox0//8, axis=0)
stats(v3, name="L3 plane-pad", aligned_planes=True)
