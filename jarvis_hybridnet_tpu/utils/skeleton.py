"""Skeleton graph coloring for pose visualization.

Equivalent of the reference get_skeleton (jarvis/utils/skeleton.py:13-161):
assigns one color per limb chain (walked from each degree-1 seed joint) and
per cycle (detected in the bone graph); joints shared between chains stay
gray; with no skeleton defined, joints get jet-colormap colors.
"""

from __future__ import annotations

import numpy as np

BASE_COLORS = [
    (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
    (255, 0, 255), (0, 255, 255), (0, 140, 255), (140, 255, 0),
    (255, 140, 0), (0, 255, 140), (255, 140, 140), (140, 255, 140),
    (140, 140, 255), (140, 140, 140),
]
GRAY = (100, 100, 100)


def _find_cycles(edges: list[list[int]]) -> list[list[int]]:
    """Simple cycles of the undirected bone graph (non-overlapping; when
    cycles share joints the longest is kept, like the reference Graph
    class, skeleton.py:92-157)."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    cycles: list[list[int]] = []

    def canonical(path):
        n = path.index(min(path))
        rot = path[n:] + path[:n]
        inv = rot[::-1]
        n2 = inv.index(min(inv))
        inv = inv[n2:] + inv[:n2]
        return min(rot, inv)

    seen = set()

    def dfs(start, node, path):
        for nxt in adj.get(node, ()):
            if nxt == start and len(path) > 2:
                c = canonical(path)
                key = tuple(c)
                if key not in seen:
                    seen.add(key)
                    cycles.append(c)
            elif nxt not in path:
                dfs(start, nxt, path + [nxt])

    for v in list(adj):
        dfs(v, v, [v])

    # keep only the longest cycle among overlapping ones
    kept: list[list[int]] = []
    for c in sorted(cycles, key=len, reverse=True):
        if not any(set(c) & set(k) for k in kept):
            kept.append(c)
    return kept


def get_skeleton(cfg):
    """Returns (colors per joint [RGB tuples], bone index pairs)."""
    if len(cfg.SKELETON) > 0:
        names = list(cfg.KEYPOINT_NAMES)
        colors = [GRAY for _ in names]
        connections = np.zeros(len(names), dtype=int)
        line_idxs = []
        starting_idxs = []
        for bone in cfg.SKELETON:
            a = names.index(bone[0])
            b = names.index(bone[1])
            starting_idxs.append(a)
            line_idxs.append([a, b])
            connections[a] += 1
            connections[b] += 1

        color_idx = 0
        cycles = _find_cycles(line_idxs)
        for cycle in cycles:
            for point in cycle:
                colors[point] = BASE_COLORS[color_idx]
            color_idx = (color_idx + 1) % len(BASE_COLORS)

        in_cycle = {p for c in cycles for p in c}
        seeds = np.nonzero(connections == 1)[0]
        accounted: set[int] = set()
        for seed in seeds:
            if seed not in starting_idxs:
                continue
            idx = int(seed)
            colors[idx] = BASE_COLORS[color_idx]
            accounted.add(idx)
            fwd = [l[1] for l in line_idxs if l[0] == idx]
            back = [l[0] for l in line_idxs if l[1] == idx]
            while len(fwd) == 1 and len(back) < 2:
                idx = fwd[0]
                if connections[idx] < 3 or idx in in_cycle:
                    if idx in accounted:
                        colors[idx] = GRAY
                    else:
                        colors[idx] = BASE_COLORS[color_idx]
                        accounted.add(idx)
                fwd = [l[1] for l in line_idxs if l[0] == idx]
                back = [l[0] for l in line_idxs if l[1] == idx]
            color_idx = (color_idx + 1) % len(BASE_COLORS)

        for point in np.nonzero(connections == 0)[0]:
            colors[point] = BASE_COLORS[color_idx]
            color_idx = (color_idx + 1) % len(BASE_COLORS)
        return colors, line_idxs

    # no skeleton: jet colormap per joint
    import matplotlib

    cmap = matplotlib.colormaps.get_cmap("jet")
    J = int(cfg.KEYPOINTDETECT.NUM_JOINTS)
    colors = [
        tuple((np.array(cmap(i / J)) * 255).astype(int)[:3].tolist())
        for i in range(J)
    ]
    return colors, []
