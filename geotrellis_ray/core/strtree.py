"""Numpy STRtree: sort-tile-recursive bulk-loaded R-tree over bboxes.

The stateful heart of the point-in-polygon join (SURVEY.md §2.3): built ONCE
per actor in ``__init__`` from the broadcast polygon table, probed per Arrow
batch. Equivalent role to the JTS STRtree GeoTrellis leans on (JTS dependency;
usage e.g. ref:spark/.../join/VectorJoin.scala, L:unverified — /root/reference
empty at survey time).

Layout: implicit array tree. Leaves hold up to ``node_capacity`` entries;
internal levels are built bottom-up by STR packing (sort by center-x, slice
into vertical runs, sort each run by center-y). Query is a vectorized
frontier walk: at each level the frontier of candidate nodes is intersected
against the query box with one numpy op.
"""

from __future__ import annotations

import numpy as np


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    """concatenate([arange(c) for c in counts]) without the Python loop
    (one arange per surviving candidate dominated query_points — measured
    ~40% of the flagship PIP probe)."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


class STRtree:
    def __init__(self, boxes: np.ndarray, node_capacity: int = 16):
        """boxes: (n, 4) float64 [xmin, ymin, xmax, ymax]."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.cap = node_capacity
        if self.n == 0:
            self.levels: list[np.ndarray] = []
            self.children: list[np.ndarray] = []
            self.order = np.empty(0, dtype=np.int64)
            return
        # --- STR pack the leaf level ---
        cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
        cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
        nleaf = int(np.ceil(self.n / node_capacity))
        nslices = int(np.ceil(np.sqrt(nleaf)))
        run = nslices * node_capacity
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(self.n, dtype=np.int64)
        pos = 0
        for s in range(0, self.n, run):
            sl = by_x[s : s + run]
            sl = sl[np.argsort(cy[sl], kind="stable")]
            order[pos : pos + len(sl)] = sl
            pos += len(sl)
        self.order = order  # leaf slot -> original box index
        self.boxes = boxes[order]
        # --- build internal levels bottom-up ---
        self.levels = [self.boxes]  # levels[0] = leaf entry boxes
        self.children = []  # children[i]: slice starts of level i+1 nodes into level i
        cur = self.boxes
        while len(cur) > 1:
            m = int(np.ceil(len(cur) / node_capacity))
            nodes = np.empty((m, 4))
            for i in range(m):
                seg = cur[i * node_capacity : (i + 1) * node_capacity]
                nodes[i] = (seg[:, 0].min(), seg[:, 1].min(), seg[:, 2].max(), seg[:, 3].max())
            self.levels.append(nodes)
            cur = nodes
        # levels: [entries, L1 nodes, ..., root]; node i at level k covers
        # children [i*cap, (i+1)*cap) at level k-1

    def query(self, xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
        """Original indices of entries whose bbox intersects the query box."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        cap = self.cap
        frontier = np.array([0], dtype=np.int64)  # node ids at the top level
        for level in range(len(self.levels) - 1, 0, -1):
            nodes = self.levels[level]
            hit = frontier[self._hits(nodes, frontier, xmin, ymin, xmax, ymax)]
            # expand to children at level-1
            child0 = hit * cap
            counts = np.minimum(cap, len(self.levels[level - 1]) - child0)
            frontier = (np.repeat(child0, counts) + _ragged_arange(counts)
                        ) if len(hit) else np.empty(0, dtype=np.int64)
            if len(frontier) == 0:
                return np.empty(0, dtype=np.int64)
        leaf_hits = frontier[self._hits(self.levels[0], frontier, xmin, ymin, xmax, ymax)]
        return self.order[leaf_hits]

    @staticmethod
    def _hits(nodes, idx, xmin, ymin, xmax, ymax) -> np.ndarray:
        b = nodes[idx]
        return ~((b[:, 0] > xmax) | (b[:, 2] < xmin) | (b[:, 1] > ymax) | (b[:, 3] < ymin))

    def query_points(self, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch point probe -> (point_idx, entry_idx) candidate pairs where
        the point lies inside the entry bbox (half-open on the max side is NOT
        applied here — bbox candidacy is inclusive; exact predicates refine).

        Vectorized level-by-level: maintains (point, node) candidate pairs."""
        if self.n == 0 or len(xs) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        cap = self.cap
        pts = np.arange(len(xs), dtype=np.int64)
        nodes = np.zeros(len(xs), dtype=np.int64)
        for level in range(len(self.levels) - 1, 0, -1):
            nb = self.levels[level]
            b = nb[nodes]
            keep = (
                (xs[pts] >= b[:, 0]) & (xs[pts] <= b[:, 2]) & (ys[pts] >= b[:, 1]) & (ys[pts] <= b[:, 3])
            )
            pts, nodes = pts[keep], nodes[keep]
            if len(pts) == 0:
                return pts, pts
            # expand each surviving (point, node) to its children
            nchild_level = len(self.levels[level - 1])
            child0 = nodes * cap
            counts = np.minimum(cap, nchild_level - child0)
            pts = np.repeat(pts, counts)
            nodes = np.repeat(child0, counts) + _ragged_arange(counts)
        b = self.levels[0][nodes]
        keep = (xs[pts] >= b[:, 0]) & (xs[pts] <= b[:, 2]) & (ys[pts] >= b[:, 1]) & (ys[pts] <= b[:, 3])
        return pts[keep], self.order[nodes[keep]]
