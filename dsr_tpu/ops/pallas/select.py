"""Pallas beam-search recombination/prune kernel — HOT LOOP 3's frame-loop
selection (BASELINE.json north_star: "beam-search inner loops as Pallas
kernels"; SURVEY.md §3.3).

The top-K token-passing decoder scores Kcap·A_max candidate arcs per frame
and must (a) recombine: keep only the best-scored candidate per
destination state, (b) beam-prune, (c) select the top-Kcap survivors.  The
XLA path does this with TWO full stable sorts of the 12k-candidate array
per frame (the lexicographic (dst,-score) sort plus `top_k`, which XLA
lowers to another full sort) — measured 29 µs/utt/frame on-chip at the
532k-state LVCSR graph, ~80% of total decode time.  Sorting 12k elements
to keep 256 is the waste this kernel removes: only a Q·128-element pool
that (certified per frame, see below) contains every possible winner is
ever fully sorted, entirely in VMEM.

  S1  beam-prune against the frame max (VPU reduce).
  S2  per-lane top-Q preselection: each vreg lane's candidate column is
      bitonic-sorted along sublanes by score (28 compare-exchange stages
      of pltpu.roll axis-0 — Mosaic's native unaligned row shift), all
      128 lanes in parallel; rows 0..Q-1 form the pool, row Q is each
      lane's best EXCLUDED score (the spill certificate, below).
      Utterances wider than 128 rows presort in 128-row SUB-blocks, each
      contributing a per-lane top-Q: the pool scales with the candidate
      count (kcap=512 / a_max=263 triphone shapes run on-chip; the
      round-3 kernel gated out everything past 16384 candidates).
  S3  the (Q,128) pool (2048 candidates at Q=16 and one sub-block) is
      bitonic-sorted IN VMEM by (dst asc, score desc, arc asc) — 66
      stages of lane/sublane rolls in row-major flat order.
  S4  recombination = neighbour compare in flat order (the first of each
      dst run is that state's max), losers' scores → NEG.
  S5  final top-kcap: one more flat bitonic by score; the leading
      kcap/128 rows are the new token list.

Batching: a frame's whole utterance batch runs as ONE kernel with utts
stacked along sublanes in 128-row blocks.  Compare-exchange partners sit
at XOR distance d from each element, and d never spans a power-of-two
block, so block-LOCAL index bits route every exchange: the per-stage
instruction count is that of one utterance while each vector op carries
all U — this is what makes the kernel beat XLA's batched sorts (a
per-utterance grid spends its time in per-stage fixed costs; measured in
KERNELS.md).  Roll wrap-around at the array edges is never selected for
the same reason.  `recombine_topk` carries a jax.custom_batching rule so
the decoder's vmap lands on the batched kernel automatically.

A threshold-select + log-shift compaction router was tried first for
S2/S5 and REJECTED on correctness, not speed: monotone compaction
distances do NOT make bitwise shifting collision-free (elements at flat
positions 1 and 3 with distances 1 and 2 collide at slot 1 on the b=2
step), and a collision silently drops a token.  Bitonic stages are
branch-free, need no cross-lane gathers, and form a total order (arc ids
are distinct).

Approximation contract: the result equals the XLA path's EXCEPT when some
lane holds more than Q of the frame's winning candidates.  Exact-score
ties resolve identically on both paths — smallest arc id — because the
XLA sort keys on (dst, -score, ARC) with num_keys=3 (review round 3: a
stable-sort position tie-break would silently diverge with spill=False).  The kernel
emits each lane's best EXCLUDED score (`excl`); the caller derives a
per-frame `spill` flag — spill=False is a machine-checked certificate
that the frame is exact (everything dropped scores below every kept
token, and recombination maxima are score-dominant, so nothing dropped
could have entered the final Kcap).  Measured spill rates on real decodes
are in KERNELS.md; parity tests drive both paths on full utterances
(tests/test_pallas_select.py, tests/test_lvcsr.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsr_tpu.ops.pallas import use_interpret

LANES = 128
NEG = -1e30


def _roll(x, shift, axis):
    """pltpu.roll with any-sign shift (Mosaic requires non-negative)."""
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis)


def _stage(planes, less, pidx, d, axis, blk, asc):
    """One bitonic compare-exchange stage over `planes` (moved together).

    pidx: block-LOCAL index array whose bit `d` distinguishes the low
    partner; the partner sits at XOR distance, reached with ±blk rolls
    along `axis`.  asc: block-direction mask, or None for an
    all-ascending merge."""
    n = planes[0].shape[axis]
    fwd = tuple(_roll(x, n - blk, axis) for x in planes)
    bwd = tuple(_roll(x, blk, axis) for x in planes)
    mine_low = (pidx & d) == 0
    partner = tuple(jnp.where(mine_low, f, b) for f, b in zip(fwd, bwd))
    want_small = mine_low if asc is None else mine_low == asc
    take_mine = want_small == less(planes, partner)
    return tuple(jnp.where(take_mine, m, p) for m, p in zip(planes, partner))


def _bitonic_sublane(planes, less, block):
    """Sort each lane's column along axis 0 independently within
    `block`-row blocks (block a power of two; 28 stages at 128)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, planes[0].shape, 0) & (block - 1)
    k = 2
    while k <= block:
        d = k // 2
        while d >= 1:
            asc = None if k == block else (ri & k) == 0
            planes = _stage(planes, less, ri, d, 0, d, asc)
            d //= 2
        k *= 2
    return planes


def _bitonic_flat(planes, less, qrows):
    """Sort planes in row-major flat order within `qrows`-row blocks
    (n = qrows*128 per block): lane rolls for partner distances < 128,
    sublane rolls above."""
    n = qrows * LANES
    ri = jax.lax.broadcasted_iota(jnp.int32, planes[0].shape, 0) & (qrows - 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, planes[0].shape, 1)
    k = 2
    while k <= n:
        if k == n:
            asc = None
        elif k < LANES:
            asc = (ci & k) == 0
        else:
            asc = (ri & (k // LANES)) == 0
        d = k // 2
        while d >= 1:
            if d < LANES:
                planes = _stage(planes, less, ci, d, 1, d, asc)
            else:
                planes = _stage(planes, less, ri, d // LANES, 0,
                                d // LANES, asc)
            d //= 2
        k *= 2
    return planes


def _less_score_desc(a, b):
    """(score desc, dst asc, arc asc) — presort and final selection."""
    va, da, aa = a
    vb, db, ab = b
    return (va > vb) | ((va == vb) & ((da < db) | ((da == db) & (aa < ab))))


def _less_dst(a, b):
    """(dst asc, score desc, arc asc) — recombination grouping order."""
    va, da, aa = a
    vb, db, ab = b
    return (da < db) | ((da == db) & ((va > vb) | ((va == vb) & (aa < ab))))


def _less_score_desc_payload(a, b):
    """1-best final order (score desc, dst asc, arc asc) with extra
    payload planes riding along (lattice-mode alternates)."""
    return _less_score_desc(a[:3], b[:3])


def _flat_prev(x):
    """x at flat index f-1 (row-major); block starts masked by caller."""
    lr = _roll(x, 1, 1)
    lrs = _roll(lr, 1, 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(ci == 0, lrs, lr)


def _flat_next(planes, d, qr, fills):
    """Each element takes the plane values at block-local flat index f+d
    (row-major within qr-row blocks, 0 < d < 128: a lane roll with a row
    carry, the forward analogue of _flat_prev); the last d elements of
    each block take `fill` instead."""
    shp = planes[0].shape
    ri = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
    fi = (ri & (qr - 1)) * LANES + ci
    nrows = shp[0]
    out = []
    for x, fill in zip(planes, fills):
        lr = _roll(x, LANES - d, 1)
        v = jnp.where(ci < LANES - d, lr, _roll(lr, nrows - 1, 0))
        out.append(jnp.where(fi < qr * LANES - d, v, fill))
    return tuple(out)


def _blocks(x, rblk, nblk, lo, hi):
    """Rows [lo, hi) of every rblk-row block, concatenated — the 2D-only
    block extraction (Mosaic's layout inference rejects in-kernel 3D
    reshapes: inferReshape check-fails on (U·R,128)→(U,R,128))."""
    parts = [x[u * rblk + lo:u * rblk + hi] for u in range(nblk)]
    return parts[0] if nblk == 1 else jnp.concatenate(parts, axis=0)


def _block_max(x, qrows):
    """Per-(qrows·128)-block max, broadcast to every element, via XOR
    spread-max (lane then sublane rolls; wrap values never win because the
    block-local bit picks the in-block direction)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) & (qrows - 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    m = x
    d = 1
    while d < LANES:
        p = jnp.where((ci & d) == 0, _roll(m, LANES - d, 1), _roll(m, d, 1))
        m = jnp.maximum(m, p)
        d *= 2
    d = 1
    while d < qrows:
        n = m.shape[0]
        p = jnp.where((ri & d) == 0, _roll(m, n - d, 0), _roll(m, d, 0))
        m = jnp.maximum(m, p)
        d *= 2
    return m


def _select_kernel(val_ref, dst_ref, arc_ref, beam_ref, vo_ref, do_ref,
                   ao_ref, excl_ref, *, nblk, rblk, q, kcap, nlat=0):
    """nblk utterance blocks of rblk rows.  Blocks wider than 128 rows
    presort in 128-row SUB-blocks (each contributing a per-lane top-q),
    so the pool grows with the candidate count instead of the presort
    depth — this is what lifts the former 16384-candidate gate (round-4
    big-pool select: kcap=512 / wide-fan-out graphs)."""
    pb = min(rblk, 128)          # presort block rows
    ns = rblk // pb              # sub-blocks per utterance
    qr = ns * q                  # pool rows per utterance
    val = val_ref[...]
    dst = dst_ref[...]
    arc = arc_ref[...]
    # S2: per-lane bitonic presort by score; rows 0..q-1 of each sub-block.
    # (Beam masking NEGs a suffix of each lane's sorted order, so pruning
    # commutes with the presort and is applied to the pool below.)
    val, dst, arc = _bitonic_sublane((val, dst, arc), _less_score_desc,
                                     pb)
    pv = _blocks(val, pb, nblk * ns, 0, q)
    pd = _blocks(dst, pb, nblk * ns, 0, q)
    pa = _blocks(arc, pb, nblk * ns, 0, q)
    excl = _blocks(val, pb, nblk * ns, q, q + 1)   # (nblk*ns, LANES)
    if ns > 1:
        # per-utterance excluded max across its ns sub-block rows
        excl = _blocks(_block_max(excl, ns), ns, nblk, 0, 1)
    # S1: beam prune against each utterance's frame max (pool max spread
    # block-wide).  beam_ref is a (U, 128) plane — genuinely
    # per-utterance beams batch through (the custom_vmap rule used to
    # silently apply utterance 0's beam; review round 4).
    mx = _block_max(pv, qr)
    beam = beam_ref[...]                                   # (nblk, LANES)
    beam_pool = (jnp.broadcast_to(beam, (qr, LANES)) if nblk == 1 else
                 jnp.concatenate(
                     [jnp.broadcast_to(beam[u:u + 1], (qr, LANES))
                      for u in range(nblk)], axis=0))
    pv = jnp.where(pv > mx - beam_pool, pv, NEG)
    excl_ref[...] = jnp.where(
        excl > _blocks(mx, qr, nblk, 0, 1) - beam, excl, NEG)
    # S3: group by destination state
    pv, pd, pa = _bitonic_flat((pv, pd, pa), _less_dst, qr)
    # S4: recombination — the first of each dst run is that state's max
    prev_d = _flat_prev(pd)
    ri = jax.lax.broadcasted_iota(jnp.int32, pv.shape, 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, pv.shape, 1)
    first = (((ri & (qr - 1)) == 0) & (ci == 0)) | (prev_d != pd)
    if nlat == 0:
        pv = jnp.where(first, pv, NEG)
        # S5: final top-kcap = one more flat sort by score
        pv, pd, pa = _bitonic_flat((pv, pd, pa), _less_score_desc, qr)
        rows_out = kcap // LANES
        vo = _blocks(pv, qr, nblk, 0, rows_out)
        alive = vo > NEG / 2
        vo_ref[...] = vo
        do_ref[...] = jnp.where(alive, _blocks(pd, qr, nblk, 0, rows_out), 0)
        ao_ref[...] = jnp.where(alive, _blocks(pa, qr, nblk, 0, rows_out), -1)
        return
    # ---- lattice mode (nlat > 0) ---------------------------------------
    # S4': a run's rank-j member sits at flat position start+j in the
    # dst-sorted pool, so each run start gathers its top-(nlat-1)
    # alternates as ALIGNED payload planes via j-step flat shifts; S5'
    # is then exactly the 1-best final sort with the payloads riding
    # along — every output winner carries its own alternates, so short
    # runs cannot misalign the (kcap, nlat) layout.
    alt_v, alt_a = [], []
    for j in range(1, nlat):
        vj, dj, aj = _flat_next((pv, pd, pa), j, qr, (NEG, -1, -1))
        ok = (dj == pd) & (vj > NEG / 2)   # same run, in-beam, not padding
        alt_v.append(jnp.where(ok, vj, NEG))
        alt_a.append(jnp.where(ok, aj, -1))
    wv = jnp.where(first, pv, NEG)
    planes = _bitonic_flat((wv, pd, pa) + tuple(alt_v) + tuple(alt_a),
                           _less_score_desc_payload, qr)
    wv, pd, pa = planes[:3]
    alt_v = planes[3:3 + nlat - 1]
    alt_a = planes[3 + nlat - 1:]
    rows_out = kcap // LANES
    vo = _blocks(wv, qr, nblk, 0, rows_out)
    alive = vo > NEG / 2
    # outputs are (nlat, U·kcap/128, 128) stacked along rows: column j of
    # the (kcap, nlat) alt layout; j=0 is the winner itself
    vs = [vo]
    das = [jnp.where(alive, _blocks(pa, qr, nblk, 0, rows_out), -1)]
    for j in range(nlat - 1):
        av = _blocks(alt_v[j], qr, nblk, 0, rows_out)
        aa_ = _blocks(alt_a[j], qr, nblk, 0, rows_out)
        vs.append(jnp.where(alive, av, NEG))
        das.append(jnp.where(alive & (av > NEG / 2), aa_, -1))
    dw = jnp.where(alive, _blocks(pd, qr, nblk, 0, rows_out), 0)
    vo_ref[...] = jnp.concatenate(vs, axis=0) if nlat > 1 else vs[0]
    ao_ref[...] = jnp.concatenate(das, axis=0) if nlat > 1 else das[0]
    do_ref[...] = jnp.concatenate([dw] * nlat, axis=0) if nlat > 1 else dw


_ROW_BUDGET = 1024   # U·R rows per kernel call: ·128·4B·3 planes + the
                     # bitonic stage temporaries must fit VMEM


def _shape_plan(n, q):
    """(R rows per utterance block, pool rows qr) for n candidates."""
    rows = -(-n // LANES)
    R = 1
    while R < rows:
        R *= 2
    R = max(R, 2 * q)
    qr = max(R // 128, 1) * q
    return R, qr


def _impl(cand, fdst, arcs, beam, kcap, q, nlat=0):
    """cand/fdst/arcs: (U, N); beam scalar or (U,).  Returns (U,kcap)
    planes + (U,) spill; lattice mode (nlat>0) returns (U,kcap,nlat)
    planes instead (column 0 = the winner)."""
    if q < 1 or (q & (q - 1)):
        raise ValueError(f"q must be a power of two, got {q}")
    nl = max(nlat, 1)
    U, n = cand.shape
    R, qr = _shape_plan(n, q)
    if kcap % LANES or kcap > qr * LANES:
        raise ValueError(
            f"kcap must be a multiple of {LANES} and <= pool rows*{LANES} "
            f"(got kcap={kcap}, q={q}, pool rows={qr}): the pool's "
            f"leading kcap/{LANES} rows are the output")
    beam = jnp.broadcast_to(jnp.asarray(beam, jnp.float32), (U,))
    u_max = max(1, _ROW_BUDGET // R)
    if U > u_max:
        outs = [_impl(cand[i:i + u_max], fdst[i:i + u_max],
                      arcs[i:i + u_max], beam[i:i + u_max], kcap, q, nlat)
                for i in range(0, U, u_max)]
        return tuple(jnp.concatenate(parts, axis=0)
                     for parts in zip(*outs))
    padn = R * LANES - n

    def prep(x, fill):
        x = jnp.pad(x, ((0, 0), (0, padn)), constant_values=fill)
        return x.reshape(U * R, LANES)

    val = prep(cand, NEG)
    dst = prep(fdst, 0)
    arc = prep(arcs, -1)
    beamp = jnp.broadcast_to(beam[:, None], (U, LANES))
    rows_out = kcap * nl // LANES
    # under shard_map (the graph-sharded decoder) outputs must declare how
    # they vary across mesh axes: the union of the input vmas
    try:
        vma = frozenset().union(
            *(jax.typeof(x).vma for x in (val, dst, arc, beamp)))
        sds = lambda shp, dt: jax.ShapeDtypeStruct(shp, dt, vma=vma)
    except (AttributeError, TypeError):
        sds = jax.ShapeDtypeStruct
    vv, dd, aa, excl = pl.pallas_call(
        functools.partial(_select_kernel, nblk=U, rblk=R, q=q, kcap=kcap,
                          nlat=nlat),
        out_shape=[
            sds((U * rows_out, LANES), jnp.float32),
            sds((U * rows_out, LANES), jnp.int32),
            sds((U * rows_out, LANES), jnp.int32),
            sds((U, LANES), jnp.float32),
        ],
        interpret=use_interpret(),
    )(val, dst, arc, beamp)
    exm = jnp.max(excl, axis=1)
    if nlat:
        # output blocks are stacked by alt column j (j=0 = the winner)
        unpack = lambda x: jnp.moveaxis(x.reshape(nlat, U, kcap), 0, -1)
        # lattice certificate is CONSERVATIVE: any in-beam presort
        # exclusion could have been some emitted run's missing alternate,
        # so exactness is only certified when nothing in-beam was
        # excluded anywhere (module docstring)
        spill = exm > NEG / 2
        return unpack(vv), unpack(dd), unpack(aa), spill
    scores = vv.reshape(U, kcap)
    alive = scores > NEG / 2
    minsel = jnp.min(jnp.where(alive, scores, jnp.inf), axis=1)
    nalive = jnp.sum(alive, axis=1)
    spill = (exm >= minsel) | ((nalive < kcap) & (exm > NEG / 2))
    return scores, dd.reshape(U, kcap), aa.reshape(U, kcap), spill


@functools.lru_cache(maxsize=None)
def _make_topk(kcap, q, nlat):
    @jax.custom_batching.custom_vmap
    def topk1(cand, fdst, arcs, beam):
        s, d, a, sp = _impl(cand[None], fdst[None], arcs[None], beam,
                            kcap, q, nlat)
        return s[0], d[0], a[0], sp[0]

    @topk1.def_vmap
    def _rule(axis_size, in_batched, cand, fdst, arcs, beam):
        cb, fb, ab, bb = in_batched
        bc = lambda x, isb: x if isb else jnp.broadcast_to(
            x, (axis_size,) + x.shape)
        # a batched beam is a genuinely per-utterance (U,) beam and rides
        # the kernel's (U, 128) beam plane (it was previously collapsed to
        # utterance 0's value — review round 4)
        out = _impl(bc(cand, cb), bc(fdst, fb), bc(arcs, ab),
                    bc(beam, bb), kcap, q, nlat)
        return out, (True, True, True, True)

    return topk1


def recombine_topk(cand, fdst, arcs, beam, *, kcap, q=16, nlat=0):
    """Token recombination + beam + top-kcap on the TPU vector core.

    cand/fdst/arcs: flat (N,) candidate scores / destination states / arc
    ids (batch via jax.vmap — the batching rule stacks utterances into one
    kernel; `beam` may be vmapped too for per-utterance beams).  Returns
    (scores (kcap,), dst (kcap,) i32, arc (kcap,) i32, spill ());
    spill=False certifies exact equality with the sort-based reference
    path (module docstring).

    nlat>0 (lattice mode): scores/dst/arc come back (kcap, nlat) — each
    winner's top-nlat incoming arcs by score, column 0 the winner itself,
    dead slots NEG/-1 — matching topk_decoder's XLA alt layout; spill is
    the conservative in-beam-exclusion certificate."""
    return _make_topk(kcap, q, nlat)(cand, fdst, arcs,
                                     jnp.asarray(beam, jnp.float32))


def supported(n_candidates: int, kcap: int, nlat: int, q: int = 16) -> bool:
    """Gate for the decoder's auto dispatch: the kernel covers the 1-best
    AND lattice (nlat a small power of two) paths up to VMEM-sized pools
    (R ≤ 2048 rows ≈ 262k candidates — the former 16384 gate fell to the
    sub-block presort, so kcap=512 on the wide-fan-out triphone HCLG runs
    on-chip); tiny configs stay on the XLA sort path."""
    if (nlat not in (0, 2, 4, 8) or kcap % LANES or kcap < LANES
            or n_candidates < 4 * LANES):
        return False
    R, qr = _shape_plan(n_candidates, q)
    # interpret mode (CPU test suites) simulates every roll stage in
    # numpy: auto-dispatch keeps big-pool shapes on the XLA sorts there
    # (they are covered directly by tests/test_pallas_select.py and the
    # on-chip parity runner) so decode-level tests stay tractable
    r_cap = 128 if use_interpret() else 2048
    return R <= r_cap and kcap <= qr * LANES
