"""2-D geometry backend for map vectorization (convert/vecmap.py).

The reference leans on shapely (dataset/nuscenes2clip.py:10-11) for patch
clipping, polygon union, and ring extraction.  shapely is an optional
dependency here: when importable, `shapely_backend()` delegates to it
(reference-parity path); otherwise `numpy_backend()` provides pure-NumPy
equivalents:

  * polyline clip to an axis-aligned box (exact, splits at exits)
  * polygon clip via Sutherland-Hodgman (exact for the convex box window)
  * polygon union via shared-edge cancellation — exact when input polygons
    tile with exactly matching edges (the nuScenes lane/road_segment case it
    is used for); partially-overlapping polygons need shapely
  * greedy endpoint linemerge, signed-area orientation

Geometries are plain numpy arrays: polylines [N, 2]; polygons are
(exterior [N, 2], [holes...]) tuples with unclosed rings.
"""
from __future__ import annotations

import numpy as np

try:
    import shapely  # noqa: F401

    HAVE_SHAPELY = True
except ImportError:
    HAVE_SHAPELY = False


def rotate_points(pts, angle_deg, origin):
    a = np.deg2rad(angle_deg)
    c, s = np.cos(a), np.sin(a)
    R = np.array([[c, -s], [s, c]])
    o = np.asarray(origin, dtype=np.float64)
    return (np.asarray(pts, dtype=np.float64) - o) @ R.T + o


def translate_points(pts, dx, dy):
    return np.asarray(pts, dtype=np.float64) + np.array([dx, dy])


def signed_area(ring):
    ring = np.asarray(ring, dtype=np.float64)
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return 0.5 * np.sum(x * y2 - x2 * y)


def is_ccw(ring):
    return signed_area(ring) > 0


# ---------------------------------------------------------------------------
# numpy backend primitives
# ---------------------------------------------------------------------------


def clip_polyline_to_box(pts, minx, miny, maxx, maxy):
    """Exact polyline ∩ box: list of sub-polylines (each [K>=2, 2])."""
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) < 2:
        return []
    out, cur = [], []

    def inside(p):
        return minx <= p[0] <= maxx and miny <= p[1] <= maxy

    def clip_seg(p, q):
        """Liang-Barsky: returns (t0, t1) in [0,1] of the inside part, or None."""
        d = q - p
        t0, t1 = 0.0, 1.0
        for dim, lo, hi in ((0, minx, maxx), (1, miny, maxy)):
            if abs(d[dim]) < 1e-300:
                if p[dim] < lo or p[dim] > hi:
                    return None
                continue
            ta = (lo - p[dim]) / d[dim]
            tb = (hi - p[dim]) / d[dim]
            if ta > tb:
                ta, tb = tb, ta
            t0, t1 = max(t0, ta), min(t1, tb)
            if t0 > t1:
                return None
        return t0, t1

    for i in range(len(pts) - 1):
        p, q = pts[i], pts[i + 1]
        res = clip_seg(p, q)
        if res is None:
            if len(cur) >= 2:
                out.append(np.asarray(cur))
            cur = []
            continue
        t0, t1 = res
        a = p + t0 * (q - p) if t0 > 0 else p
        b = p + t1 * (q - p) if t1 < 1 else q
        if not cur:
            cur = [a]
        elif not np.allclose(cur[-1], a, atol=1e-12):
            if len(cur) >= 2:
                out.append(np.asarray(cur))
            cur = [a]
        cur.append(b)
        if t1 < 1:  # exits the box: close this piece
            if len(cur) >= 2:
                out.append(np.asarray(cur))
            cur = []
    if len(cur) >= 2:
        out.append(np.asarray(cur))
    # drop degenerate pieces
    return [c for c in out if np.linalg.norm(np.diff(c, axis=0), axis=1).sum() > 1e-12]


def clip_polygon_to_box(ring, minx, miny, maxx, maxy):
    """Sutherland-Hodgman polygon ∩ box -> single ring [K, 2] or None."""
    poly = [np.asarray(p, dtype=np.float64) for p in np.asarray(ring, dtype=np.float64)]

    def clip_edge(poly, axis, value, keep_less):
        if not poly:
            return []
        out = []
        n = len(poly)
        for i in range(n):
            cur, nxt = poly[i], poly[(i + 1) % n]
            cin = (cur[axis] <= value) if keep_less else (cur[axis] >= value)
            nin = (nxt[axis] <= value) if keep_less else (nxt[axis] >= value)
            if cin:
                out.append(cur)
            if cin != nin:
                t = (value - cur[axis]) / (nxt[axis] - cur[axis])
                out.append(cur + t * (nxt - cur))
        return out

    poly = clip_edge(poly, 0, maxx, True)
    poly = clip_edge(poly, 0, minx, False)
    poly = clip_edge(poly, 1, maxy, True)
    poly = clip_edge(poly, 1, miny, False)
    if len(poly) < 3:
        return None
    ring = np.asarray(poly)
    if abs(signed_area(ring)) < 1e-12:
        return None
    return ring


def _dedupe_ring(ring):
    """Remove consecutive duplicate vertices (incl. wraparound)."""
    ring = np.asarray(ring, dtype=np.float64)
    keep = np.ones(len(ring), bool)
    keep[1:] = np.linalg.norm(ring[1:] - ring[:-1], axis=1) > 1e-12
    ring = ring[keep]
    if len(ring) > 1 and np.linalg.norm(ring[0] - ring[-1]) < 1e-12:
        ring = ring[:-1]
    return ring


def union_tiling_polygons(polygons):
    """Union of polygons whose shared edges match exactly (edge cancellation).

    polygons: list of (exterior_ring, [hole_rings...]).
    Returns list of (exterior_ring CCW, [hole_rings CW]).
    """
    from collections import defaultdict

    def key(p):
        return (round(float(p[0]) * 1e9), round(float(p[1]) * 1e9))

    # gather all vertices so differently-subdivided shared edges can be split
    # at every vertex that lies on them (node insertion)
    all_rings = []
    for ext, holes in polygons:
        rings = [_dedupe_ring(ext)] + [_dedupe_ring(h) for h in holes]
        for ri, ring in enumerate(rings):
            want_ccw = ri == 0
            if is_ccw(ring) != want_ccw:
                ring = ring[::-1]
            all_rings.append(ring)
    if not all_rings:
        return []
    verts = np.concatenate(all_rings, axis=0)

    def split_edge(p, q):
        """Yield the chain p..q subdivided at collinear interior vertices."""
        d = q - p
        L2 = float(d @ d)
        if L2 < 1e-24:
            return [p, q]
        t = ((verts - p) @ d) / L2
        on = (t > 1e-12) & (t < 1 - 1e-12)
        if on.any():
            proj = p + t[on, None] * d
            dist2 = np.sum((verts[on] - proj) ** 2, axis=1)
            hit = dist2 < 1e-18
            ts = np.unique(np.round(t[on][hit], 12))
            pts = [p] + [p + tt * d for tt in ts] + [q]
            return pts
        return [p, q]

    edge_count = defaultdict(int)
    edges = []
    for ring in all_rings:
        n = len(ring)
        for i in range(n):
            chain = split_edge(ring[i].copy(), ring[(i + 1) % n].copy())
            for j in range(len(chain) - 1):
                a, b = key(chain[j]), key(chain[j + 1])
                if a == b:
                    continue
                edges.append((a, b, chain[j], chain[j + 1]))
                edge_count[(a, b)] += 1

    # cancel edges pairwise against their reverse twins (shared boundaries)
    emitted = defaultdict(int)
    boundary = defaultdict(list)  # start -> list of (end, start_pt, end_pt)
    for a, b, pa, pb in edges:
        net = edge_count[(a, b)] - edge_count.get((b, a), 0)
        if emitted[(a, b)] < net:
            emitted[(a, b)] += 1
            boundary[a].append((b, pa, pb))

    # walk loops
    loops = []
    while any(boundary.values()):
        start = next(k for k, v in boundary.items() if v)
        b, pa, pb = boundary[start].pop()
        loop = [pa]
        cur = b
        cur_pt = pb
        guard = 0
        while cur != start and guard < 1000000:
            loop.append(cur_pt)
            nxts = boundary.get(cur)
            if not nxts:
                break  # open chain (shouldn't happen on valid tilings)
            b2, pa2, pb2 = nxts.pop()
            cur, cur_pt = b2, pb2
            guard += 1
        if len(loop) >= 3:
            loops.append(np.asarray(loop))

    exteriors = [lp for lp in loops if is_ccw(lp)]
    holes = [lp for lp in loops if not is_ccw(lp)]

    # assign holes to the exterior containing them
    out = []
    for ext in exteriors:
        my_holes = [h for h in holes if _point_in_ring(h[0], ext)]
        out.append((ext, my_holes))
    return out


def _point_in_ring(pt, ring):
    x, y = pt
    ring = np.asarray(ring)
    x0, y0 = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    cond = (y0 <= y) != (y1 <= y)
    with np.errstate(all="ignore"):
        xi = x0 + (y - y0) / (y1 - y0) * (x1 - x0)
    return int(np.sum(cond & (x < xi))) % 2 == 1


def linemerge(lines):
    """Greedy merge of polylines sharing endpoints (shapely.ops.linemerge-ish)."""
    lines = [np.asarray(l, dtype=np.float64) for l in lines if len(l) >= 2]

    def key(p):
        return (round(float(p[0]) * 1e9), round(float(p[1]) * 1e9))

    merged = True
    while merged and len(lines) > 1:
        merged = False
        for i in range(len(lines)):
            for j in range(i + 1, len(lines)):
                a, b = lines[i], lines[j]
                if key(a[-1]) == key(b[0]):
                    lines[i] = np.concatenate([a, b[1:]])
                elif key(a[-1]) == key(b[-1]):
                    lines[i] = np.concatenate([a, b[::-1][1:]])
                elif key(a[0]) == key(b[-1]):
                    lines[i] = np.concatenate([b, a[1:]])
                elif key(a[0]) == key(b[0]):
                    lines[i] = np.concatenate([b[::-1], a[1:]])
                else:
                    continue
                lines.pop(j)
                merged = True
                break
            if merged:
                break
    return lines
