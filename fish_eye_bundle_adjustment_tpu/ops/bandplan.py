"""Host-side banded grouping of the observation stream for the fused
Pallas S-matvec (ops/fusedmv.py).

The matrix-free Schur matvec couples two axes of the observation stream:
every row needs its image's 6 pose entries (gather) and its tie point's
3x3 eliminated block (segment reduce + expand).  XLA prices each of
those at ~2.6 ns/row — five per matvec ~= 12-17 ms at 1M observations —
because it treats the indices as arbitrary.  They are not:

* sorted by tie, the tie side is CONTIGUOUS (grouped spans, exactly the
  streamseg structure), and
* a survey block is spatially coherent — the images observing a bucket
  of nearby ties form a narrow BAND of the (suitably ordered) image
  axis.

This module computes that structure on the host, once per problem:

1. ties are RENUMBERED by spatial coherence (mean observing image id —
   input image order is flight order in a survey block, reference
   analogue: the .ext row order of main.m:53) so consecutive tie ranks
   see overlapping image sets;
2. optionally the images are renumbered the same way (mean observing
   tie rank) and the better of the two orderings kept;
3. the stream is sorted by tie rank, ranks grouped M at a time into
   contiguous spans padded to T lanes (128-aligned DMA starts), and the
   image band [img_base, img_base + W) of each group recorded with
   img_base 128-aligned and W the worst-case padded width.

If the data has no band structure (every image sees every tie — e.g. a
calibration-lab dataset like cam0), W degenerates to ~n_img, which is
exactly the dense one-hot fallback: still correct, still fast for small
n_img, and the caller can reject the plan past a width cap for large
unstructured problems (fused=False -> the XLA path).

The reference has no analogue of any of this (dense A in one memory,
main.m:424-425); the banding is what makes the coupling MXU-shaped.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def _align_down(a, m):
    return (a // m) * m


def _align_up(a, m):
    return -(-a // m) * m


@dataclasses.dataclass(frozen=True)
class BandPlan:
    """Static banded-stream structure (host arrays; ints are Python)."""

    # observation ordering: position in the banded stream -> original row
    order: np.ndarray  # (n_obs,) int64
    # tie renumbering: slot (layout order) <-> rank (stream order)
    rank_of_slot: np.ndarray  # (n_tie,) int32
    slot_of_rank: np.ndarray  # (n_tie,) int32
    # image renumbering (identity unless reordering won)
    imgrank_of_img: np.ndarray  # (n_img,) int32
    img_of_imgrank: np.ndarray  # (n_img,) int32
    # grouped spans over the rank-sorted stream (all row offsets global)
    row_start: np.ndarray  # (G,) int32, 128-aligned DMA start
    first_row: np.ndarray  # (G,) int32 first row owned by the group
    end_row: np.ndarray  # (G,) int32 one past the last owned row
    img_base: np.ndarray  # (G,) int32, 128-aligned image-band start
    rel: np.ndarray  # (n_pad,) float32: tie rank % M per row, -1 padding
    imgrow: np.ndarray  # (n_pad,) float32: image rank per row, -1 padding
    n_tie: int
    n_img: int
    n_rows: int  # live rows (tie obs only; control obs follow)
    n_obs: int  # total observations (incl. control)
    n_pad: int  # padded stream length the kernel expects
    M: int  # tie ranks per group
    T: int  # worst-case 128-aligned span (lanes)
    W: int  # worst-case 128-aligned image-band width (lanes)
    n_img_pad: int  # padded image-axis length (>= img_base.max() + W)

    @property
    def G(self) -> int:
        return int(self.row_start.shape[0])

    @property
    def read_amplification(self) -> float:
        return self.G * self.T / max(self.n_rows, 1)

    @property
    def band_amplification(self) -> float:
        """Mean one-hot work vs the dense n_img alternative (W / n_img)."""
        return self.W / max(self.n_img, 1)


def _bands_for_order(tie_rank_per_obs, img_rank_per_obs, n_tie, M):
    """Group spans + image bands for one candidate ordering.

    Returns (order, row_start, first_row, end_row, img_lo, img_hi, T)
    with the stream sorted by tie rank (control obs, rank == n_tie,
    sorted last and excluded from every group)."""
    order = np.argsort(tie_rank_per_obs, kind="stable")
    ranks = tie_rank_per_obs[order]
    imgs = img_rank_per_obs[order]
    n_rows = int(np.searchsorted(ranks, n_tie))
    starts = np.searchsorted(ranks[:n_rows], np.arange(n_tie + 1)).astype(
        np.int64
    )
    G = max(1, -(-n_tie // M))
    pad = G * M - n_tie
    begs = np.concatenate([starts[:-1], np.full(pad, n_rows, np.int64)])
    ends = np.concatenate([starts[1:], np.full(pad, n_rows, np.int64)])
    gb = begs.reshape(G, M)
    ge = ends.reshape(G, M)
    first_row = gb[:, 0]
    end_row = ge[:, -1]
    row_start = _align_down(first_row, 128)
    span = end_row - row_start
    T = int(max(128, _align_up(int(span.max(initial=0)), 128)))
    # image band per group over its owned rows
    img_lo = np.zeros(G, np.int64)
    img_hi = np.ones(G, np.int64)
    for g in range(G):
        a, b = int(first_row[g]), int(end_row[g])
        if b > a:
            seg = imgs[a:b]
            img_lo[g] = int(seg.min())
            img_hi[g] = int(seg.max()) + 1
    return order, ranks, row_start, first_row, end_row, img_lo, img_hi, T


def build_band_plan(
    tie_per_obs: np.ndarray,
    img_per_obs: np.ndarray,
    n_tie: int,
    n_img: int,
    M: int = 128,
    max_T: int = 16 * 1024,
    max_W: int = 2048,
    try_image_reorder: bool = True,
) -> Optional[BandPlan]:
    """Build the banded plan, or None when the structure is too ragged
    (T or W past the VMEM/MXU-derived caps) and the caller should use
    the XLA gather/segsum path.

    `tie_per_obs` uses layout slot ids with n_tie marking control
    observations; `img_per_obs` original image indices."""
    if n_tie == 0:
        return None
    tie_per_obs = np.asarray(tie_per_obs, np.int64)
    img_per_obs = np.asarray(img_per_obs, np.int64)
    n_obs = tie_per_obs.shape[0]
    live = tie_per_obs < n_tie

    # -- tie renumbering by mean observing image id ----------------------
    sum_img = np.zeros(n_tie, np.float64)
    cnt = np.zeros(n_tie, np.float64)
    np.add.at(sum_img, tie_per_obs[live], img_per_obs[live])
    np.add.at(cnt, tie_per_obs[live], 1.0)
    key = np.where(cnt > 0, sum_img / np.maximum(cnt, 1.0), np.inf)
    slot_of_rank = np.argsort(key, kind="stable").astype(np.int32)
    rank_of_slot = np.empty(n_tie, np.int32)
    rank_of_slot[slot_of_rank] = np.arange(n_tie, dtype=np.int32)
    tie_rank_per_obs = np.where(
        live, rank_of_slot[np.minimum(tie_per_obs, n_tie - 1)], n_tie
    ).astype(np.int64)

    candidates = []
    ident = np.arange(n_img, dtype=np.int32)
    cand = _bands_for_order(tie_rank_per_obs, img_per_obs, n_tie, M)
    candidates.append((ident, ident, cand))

    if try_image_reorder and n_img > 1:
        # image renumbering by mean observing tie rank
        s2 = np.zeros(n_img, np.float64)
        c2 = np.zeros(n_img, np.float64)
        np.add.at(s2, img_per_obs[live], tie_rank_per_obs[live])
        np.add.at(c2, img_per_obs[live], 1.0)
        key2 = np.where(c2 > 0, s2 / np.maximum(c2, 1.0), np.inf)
        img_of_imgrank = np.argsort(key2, kind="stable").astype(np.int32)
        imgrank_of_img = np.empty(n_img, np.int32)
        imgrank_of_img[img_of_imgrank] = np.arange(n_img, dtype=np.int32)
        cand2 = _bands_for_order(
            tie_rank_per_obs, imgrank_of_img[img_per_obs].astype(np.int64),
            n_tie, M,
        )
        candidates.append((imgrank_of_img, img_of_imgrank, cand2))

    def width(c):
        _, _, _, _, _, lo, hi, _ = c
        base = _align_down(lo, 128)
        return int(_align_up(int((hi - base).max(initial=1)), 128))

    candidates.sort(key=lambda t: width(t[2]))
    imgrank_of_img, img_of_imgrank, best = candidates[0]
    order, ranks, row_start, first_row, end_row, img_lo, img_hi, T = best
    if T > max_T:
        return None

    n_rows = int(np.searchsorted(ranks, n_tie))
    img_ranked = imgrank_of_img[img_per_obs[order]].astype(np.int64)

    # -- control-observation tail: camera-only groups --------------------
    # Control obs (rank == n_tie) still contribute to the Hcc part of the
    # matvec (schur.py _cam_apply/_cam_applyT include them); cover the
    # tail with extra groups whose tie mask is empty (rel = -1).  Their
    # relative order is free, so sort by image rank for tight bands.
    if n_rows < n_obs:
        tail = np.argsort(img_ranked[n_rows:n_obs], kind="stable") + n_rows
        order = np.concatenate([order[:n_rows], order[tail], order[n_obs:]])
        img_ranked = imgrank_of_img[img_per_obs[order]].astype(np.int64)
        span_cap = max(T - 128, 128)
        t_first = np.arange(n_rows, n_obs, span_cap, dtype=np.int64)
        t_end = np.minimum(t_first + span_cap, n_obs)
        t_start = _align_down(t_first, 128)
        t_lo = np.array(
            [img_ranked[a:b].min() for a, b in zip(t_first, t_end)], np.int64
        )
        t_hi = np.array(
            [img_ranked[a:b].max() + 1 for a, b in zip(t_first, t_end)],
            np.int64,
        )
        T = max(T, int(_align_up(int((t_end - t_start).max()), 128)))
        row_start = np.concatenate([row_start, t_start])
        first_row = np.concatenate([first_row, t_first])
        end_row = np.concatenate([end_row, t_end])
        img_lo = np.concatenate([img_lo, t_lo])
        img_hi = np.concatenate([img_hi, t_hi])
        if T > max_T:
            return None

    img_base = _align_down(img_lo, 128)
    W = max(128, int(_align_up(int((img_hi - img_base).max(initial=1)), 128)))
    if W > max_W:
        return None
    n_img_pad = int(max(_align_up(n_img, 128), (img_base + W).max(initial=W)))

    n_pad = int(max(int(row_start.max(initial=0)) + T, n_obs))
    rel = np.full(n_pad, -1.0, np.float32)
    rel[:n_rows] = (ranks[:n_rows] % M).astype(np.float32)
    imgrow = np.full(n_pad, -1.0, np.float32)
    # control rows keep their image rank: they contribute to the camera
    # (Hcc) part of the matvec even without a tie block
    imgrow[:n_obs] = img_ranked.astype(np.float32)

    return BandPlan(
        order=order,
        rank_of_slot=rank_of_slot,
        slot_of_rank=slot_of_rank,
        imgrank_of_img=imgrank_of_img,
        img_of_imgrank=img_of_imgrank,
        row_start=row_start.astype(np.int32),
        first_row=first_row.astype(np.int32),
        end_row=end_row.astype(np.int32),
        img_base=img_base.astype(np.int32),
        rel=rel,
        imgrow=imgrow,
        n_tie=int(n_tie),
        n_img=int(n_img),
        n_rows=n_rows,
        n_obs=int(n_obs),
        n_pad=n_pad,
        M=int(M),
        T=int(T),
        W=int(W),
        n_img_pad=n_img_pad,
    )
