"""Tie-axis (point-state) sharding for the distributed Schur solver.

SURVEY §2.5 row 2 mandates sharding BOTH camera and point block state.
Through round 3 every distributed mode replicated the point state: Hpp^-1
and each per-tie segment sum lived full-size on every device, and every
point reduction was a full (n_tie, k) psum — the memory and ICI wall at
the 10M-tie tier.

The fix exploits the same structure as everything else in this solver:
the observation stream is TIE-SORTED, and the obs axis is sharded in
contiguous equal slices.  Therefore

* each device's slice covers a CONTIGUOUS tie range [t_lo_d, t_hi_d];
* at most ONE tie straddles each slice boundary (<= N-1 "boundary"
  ties in total);
* a tie is OWNED by the device holding its first row.

Per-device point state becomes local: (L, ...) arrays with
L = max_d span_d ~ n_tie/N (+1 boundary tie).  Local segment sums are
complete except on the boundary ties, which are finished by exchanging a
tiny static buffer: every device scatters its boundary-tie partials into
a (B, k) buffer at host-planned positions (B <= N-1), one psum of that
buffer completes them, and each device writes the completed rows back
into its local slots.  The psum payload drops from 3*n_tie words to
O(N) words — O(boundaries), as the r2/r3 verdicts specified.

The global (n_tie, 3) point correction is materialized ONCE per GN step
(back-substitution output, needed to assemble the replicated delta_q at
the step boundary) by an all_gather of the owned slices.

No reference analogue: the reference holds the dense normal matrix in
one memory (main.m:424-443).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TieShardArrays:
    """Per-shard tie-locality plan.  Leaves with a leading (N, ...) axis
    are sharded on the mesh axis (one row per device); `owner_*` leaves
    are replicated.  Static geometry in meta fields."""

    # (N, n_loc) int32: local tie id per local obs row (L = dummy/sentinel
    # for control/pad rows and rows of ties outside the local span)
    tie_local: jax.Array
    # (N, L + 1) int32 local segment layout (begs/ends, local row offsets)
    begs: jax.Array
    ends: jax.Array
    # (N, Bp) int32: local slot of each global boundary tie (L = absent)
    bslot: jax.Array
    # (N, 1) int32: first owned local slot / owned slot-range LENGTH
    # (owned ids may contain zero-observation holes; see build_tie_shard)
    own_lo: jax.Array
    own_n: jax.Array
    # replicated reassembly map: global tie -> (owner device, local slot
    # within the owner's OWNED range)
    owner_of_tie: jax.Array  # (n_tie,) int32
    pos_in_owner: jax.Array  # (n_tie,) int32
    L: int = dataclasses.field(metadata=dict(static=True), default=0)
    Bp: int = dataclasses.field(metadata=dict(static=True), default=1)
    max_own: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_tie: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_shards: int = dataclasses.field(metadata=dict(static=True), default=1)


def build_tie_shard(tie_sorted: np.ndarray, n_tie: int,
                    n_shards: int) -> TieShardArrays:
    """Host-side plan from the PADDED tie-sorted id stream (control and
    padding rows carry id == n_tie), split into n_shards equal slices."""
    n = tie_sorted.shape[0]
    assert n % n_shards == 0, (n, n_shards)
    m = n // n_shards
    tie_sorted = np.asarray(tie_sorted, np.int64)

    # global tie start rows (ties tile the live prefix contiguously)
    starts = np.searchsorted(tie_sorted, np.arange(n_tie + 1))
    counts = np.diff(starts)
    owner_of_tie = np.minimum(starts[:-1] // m, n_shards - 1).astype(np.int64)
    # a tie with ZERO observations (legal: .tie entries are checked against
    # .cnt, not .pho) has no rows anywhere; its "start" is the next tie's
    # start, which can land in a shard whose live span excludes it and
    # poison own_lo (r4 advisor finding).  Route such ties to a virtual
    # zero plane (owner == n_shards): their correct dp is exactly 0.
    owner_of_tie[counts == 0] = n_shards

    spans = []  # (t_lo, t_hi_incl) live tie range per shard; (-1,-2) if none
    for d in range(n_shards):
        sl = tie_sorted[d * m : (d + 1) * m]
        live = sl[sl < n_tie]
        if live.size:
            spans.append((int(live[0]), int(live[-1])))
        else:
            spans.append((0, -1))
    L = max((hi - lo + 1) for lo, hi in spans) if spans else 0
    L = max(L, 1)

    boundary = sorted(
        {t for d in range(1, n_shards)
         for t in [int(tie_sorted[d * m])] if t < n_tie
         if starts[t] < d * m}  # starts before the boundary -> straddles
    )
    Bp = max(len(boundary), 1)

    tie_local = np.full((n_shards, m), L, np.int32)
    begs = np.zeros((n_shards, L + 1), np.int32)
    ends = np.zeros((n_shards, L + 1), np.int32)
    bslot = np.full((n_shards, Bp), L, np.int32)
    own_lo = np.zeros((n_shards, 1), np.int32)
    own_n = np.zeros((n_shards, 1), np.int32)
    pos_in_owner = np.zeros(n_tie, np.int32)

    for d in range(n_shards):
        lo, hi = spans[d]
        sl = tie_sorted[d * m : (d + 1) * m]
        if hi >= lo:
            loc = sl - lo
            tie_local[d] = np.where(sl < n_tie, loc, L).astype(np.int32)
            # local segment layout over ids 0..L (sentinel L collects rest)
            ids = tie_local[d]
            order_ok = ids  # slice of a sorted stream is sorted
            s = np.searchsorted(order_ok, np.arange(L + 2))
            begs[d] = s[:-1][: L + 1]
            ends[d] = s[1:][: L + 1]
            for j, t in enumerate(boundary):
                if lo <= t <= hi:
                    bslot[d, j] = t - lo
            owned = np.nonzero(owner_of_tie == d)[0]
            if owned.size:
                # positions are SLOT-based (owned[i] - owned[0]), not rank
                # among owned: an interior zero-observation tie punches a
                # hole in the owned id range, and its hole slot (which
                # correctly holds 0 — no rows ever reduce into it) must
                # not shift later owned ties' positions
                own_lo[d, 0] = int(owned[0]) - lo
                own_n[d, 0] = int(owned[-1] - owned[0] + 1)
                pos_in_owner[owned] = (owned - owned[0]).astype(np.int32)
                assert own_lo[d, 0] >= 0, (d, own_lo[d, 0])
    max_own = int(own_n.max()) if n_tie else 0

    return TieShardArrays(
        tie_local=jnp.asarray(tie_local),
        begs=jnp.asarray(begs),
        ends=jnp.asarray(ends),
        bslot=jnp.asarray(bslot),
        own_lo=jnp.asarray(own_lo),
        own_n=jnp.asarray(own_n),
        owner_of_tie=jnp.asarray(owner_of_tie.astype(np.int32)),
        pos_in_owner=jnp.asarray(pos_in_owner),
        L=int(L), Bp=int(Bp), max_own=max(max_own, 1),
        n_tie=int(n_tie), n_shards=int(n_shards),
    )


def pspec(obs_axis: str, ts: TieShardArrays) -> TieShardArrays:
    """PartitionSpec tree: stacked per-shard leaves on the mesh axis,
    reassembly maps replicated.  Meta fields copied from `ts` so the
    tree structures (which include the static geometry) match."""
    from jax.sharding import PartitionSpec as P

    sh, rep = P(obs_axis), P()
    return TieShardArrays(
        tie_local=sh, begs=sh, ends=sh, bslot=sh, own_lo=sh, own_n=sh,
        owner_of_tie=rep, pos_in_owner=rep,
        L=ts.L, Bp=ts.Bp, max_own=ts.max_own, n_tie=ts.n_tie,
        n_shards=ts.n_shards,
    )


def _squeeze(a):
    return a[0] if a.ndim > 1 else a


class LocalTieOps:
    """In-shard point-block operations over the local tie span.

    Instantiated INSIDE shard_map; every per-shard leaf of `ts` arrives
    with a leading axis of 1."""

    def __init__(self, ts: TieShardArrays, axis_name: str):
        self.L = ts.L
        self.Bp = ts.Bp
        self.ax = axis_name
        self.tie_local = ts.tie_local[0]
        self.begs = ts.begs[0]
        self.ends = ts.ends[0]
        self.bslot = ts.bslot[0]
        self.own_lo = ts.own_lo[0, 0]
        self.own_n = ts.own_n[0, 0]
        self.max_own = ts.max_own
        self.n_tie = ts.n_tie
        self.owner_of_tie = ts.owner_of_tie
        self.pos_in_owner = ts.pos_in_owner

    def complete(self, partial):
        """Finish boundary segments of a local (L+1, k) partial sum with
        the O(boundaries) exchange; dummy row L stays untouched."""
        buf = partial[self.bslot]  # (Bp, k); absent ties gather garbage...
        present = (self.bslot < self.L)[:, None]
        buf = jnp.where(present, buf, 0.0)
        done = jax.lax.psum(buf, self.ax)  # (Bp, k) tiny payload
        # write completed rows back into local slots (absent -> dummy L)
        return partial.at[self.bslot].set(
            jnp.where(present, done, partial[jnp.minimum(self.bslot, self.L)])
        )

    def segsum(self, vals):
        """Local sorted segment sum (n_loc, k) -> (L+1, k), boundary rows
        completed across shards.  The sentinel row L (control/pad rows'
        accumulator) is zeroed — expand() gathers it for those rows."""
        from fish_eye_bundle_adjustment_tpu.ops.segment import (
            SegmentLayout,
            sorted_segment_sum,
        )

        layout = SegmentLayout(begs=self.begs, ends=self.ends)
        out = self.complete(sorted_segment_sum(vals, layout))
        return out.at[self.L].set(0.0)

    def expand(self, table, k=3):
        """Local per-tie table (L+1, k) -> per-row values (gather by the
        local tie id; dummy row L must be zero)."""
        return table[self.tie_local]

    def gather_global(self, local_vals):
        """Owned slices -> replicated global (n_tie, k) (once per step)."""
        k = local_vals.shape[-1]
        # pad so the dynamic slice never clamps (a clamped start would
        # shift valid rows against pos_in_owner)
        padded = jnp.concatenate(
            [local_vals, jnp.zeros((self.max_own, k), local_vals.dtype)], 0
        )
        own = jax.lax.dynamic_slice_in_dim(
            padded, self.own_lo, self.max_own, 0
        )  # (max_own, k); rows past own_n are garbage, masked by the map
        allg = jax.lax.all_gather(own, self.ax, axis=0)  # (N, max_own, k)
        # virtual zero plane for zero-observation ties (owner == n_shards)
        allg = jnp.concatenate(
            [allg, jnp.zeros((1, self.max_own, k), allg.dtype)], axis=0
        )
        return allg[self.owner_of_tie, self.pos_in_owner]  # (n_tie, k)
