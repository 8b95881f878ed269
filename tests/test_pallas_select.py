"""Parity tests for the Pallas recombination/prune kernel
(ops/pallas/select.py) against a NumPy transcription of the decoder's
sort-based reference path (topk_decoder._make_step lines 155-170)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dsr_tpu.ops.pallas import select

NEG = select.NEG


def ref_select(cand, fdst, arcs, beam, kcap):
    """The XLA path: lexicographic sort-recombine, beam, exact top-k.
    Returns (scores, dst, arc) of the kept tokens, dead slots NEG."""
    order = np.lexsort((arcs, -cand, fdst))
    sd, sv, sa = fdst[order], cand[order], arcs[order]
    first = np.r_[True, sd[1:] != sd[:-1]]
    val = np.where(first, sv, NEG)
    mx = val.max()
    val = np.where(val > mx - beam, val, NEG)
    top = np.argsort(-val, kind="stable")[:kcap]
    return val[top], sd[top], sa[top]


def pairs(scores, dst, arc):
    alive = scores > NEG / 2
    return sorted(zip(np.asarray(dst)[alive].tolist(),
                      np.round(np.asarray(scores)[alive], 4).tolist(),
                      np.asarray(arc)[alive].tolist()))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n,kcap,ndst,beam", [
    (2000, 128, 400, 1e9),     # heavy dst duplication
    (2000, 128, 400, 2.0),     # beam actually prunes
    (12032, 256, 5000, 1e9),   # the LVCSR bench shape
    (600, 128, 10000, 1e9),    # fewer candidates than kcap survivors
    (512, 256, 300, 1e9),      # sharded cross-shard MERGE shape (round 5):
                               # n_model*kcap candidates at the 4*LANES min
])
def test_kernel_matches_sort_path(seed, n, kcap, ndst, beam):
    rng = np.random.default_rng(seed)
    cand = rng.standard_normal(n).astype(np.float32) * 5
    fdst = rng.integers(0, ndst, n).astype(np.int32)
    arcs = np.arange(n, dtype=np.int32)
    rs, rd, ra = ref_select(cand, fdst, arcs, beam, kcap)
    ks, kd, ka, spill = select.recombine_topk(
        jnp.asarray(cand), jnp.asarray(fdst), jnp.asarray(arcs),
        jnp.float32(beam), kcap=kcap)
    assert not bool(spill), "random spread should not spill"
    assert pairs(ks, kd, ka) == pairs(rs, rd, ra)


@pytest.mark.parametrize("n,kcap,ndst,beam", [
    (24064, 512, 20000, 1e9),   # monophone kcap=512 (past the old 16384 gate)
    (24064, 512, 20000, 6.0),   # …with a binding beam
    (40000, 256, 30000, 1e9),   # R=512: four presort sub-blocks
])
def test_kernel_big_pool_matches_sort_path(n, kcap, ndst, beam):
    """Round-4 big-pool select: blocks wider than 128 rows presort in
    128-row sub-blocks, each contributing a per-lane top-q to the pool."""
    rng = np.random.default_rng(11)
    cand = rng.standard_normal(n).astype(np.float32) * 5
    fdst = rng.integers(0, ndst, n).astype(np.int32)
    arcs = np.arange(n, dtype=np.int32)
    rs, rd, ra = ref_select(cand, fdst, arcs, beam, kcap)
    ks, kd, ka, spill = select.recombine_topk(
        jnp.asarray(cand), jnp.asarray(fdst), jnp.asarray(arcs),
        jnp.float32(beam), kcap=kcap)
    assert not bool(spill), "random spread should not spill"
    assert pairs(ks, kd, ka) == pairs(rs, rd, ra)


def test_per_utterance_beams_batch():
    """vmapped beams must apply each utterance's OWN beam (the batching
    rule used to collapse to utterance 0's — review round 4)."""
    import jax
    rng = np.random.default_rng(5)
    U, n, kcap = 3, 2048, 128
    cand = rng.standard_normal((U, n)).astype(np.float32) * 5
    fdst = rng.integers(0, 500, (U, n)).astype(np.int32)
    arcs = np.broadcast_to(np.arange(n, dtype=np.int32), (U, n)).copy()
    beams = np.asarray([1e9, 3.0, 0.5], np.float32)
    ks, kd, ka, spill = jax.vmap(
        lambda c, f, a, b: select.recombine_topk(c, f, a, b, kcap=kcap)
    )(jnp.asarray(cand), jnp.asarray(fdst), jnp.asarray(arcs),
      jnp.asarray(beams))
    for u in range(U):
        rs, rd, ra = ref_select(cand[u], fdst[u], arcs[u], beams[u], kcap)
        assert not bool(spill[u])
        assert pairs(ks[u], kd[u], ka[u]) == pairs(rs, rd, ra)


def test_spill_flags_adversarial_lane():
    """Cram > q winners into one lane: the kernel must raise `spill`
    rather than silently drop them."""
    n, kcap, q = 4096, 128, 16
    rng = np.random.default_rng(7)
    cand = rng.standard_normal(n).astype(np.float32)
    # lane 5 (flat index ≡ 5 mod 128) gets the 24 largest scores
    hot = 5 + 128 * np.arange(24)
    cand[hot] = 100.0 + np.arange(24)
    fdst = np.arange(n, dtype=np.int32)     # no dups: all are winners
    arcs = np.arange(n, dtype=np.int32)
    _, _, _, spill = select.recombine_topk(
        jnp.asarray(cand), jnp.asarray(fdst), jnp.asarray(arcs),
        jnp.float32(1e9), kcap=kcap, q=q)
    assert bool(spill)


def test_spill_flags_adversarial_lane_sub_block():
    """Same, but the hot lane sits in the SECOND 128-row presort
    sub-block of a big-pool (R=256) call."""
    n, kcap, q = 24064, 128, 16
    rng = np.random.default_rng(9)
    cand = rng.standard_normal(n).astype(np.float32)
    base = 128 * 128      # flat start of sub-block 1
    hot = base + 7 + 128 * np.arange(24)
    cand[hot] = 100.0 + np.arange(24)
    fdst = np.arange(n, dtype=np.int32)
    arcs = np.arange(n, dtype=np.int32)
    _, _, _, spill = select.recombine_topk(
        jnp.asarray(cand), jnp.asarray(fdst), jnp.asarray(arcs),
        jnp.float32(1e9), kcap=kcap, q=q)
    assert bool(spill)


def ref_select_lat(cand, fdst, arcs, beam, kcap, nlat):
    """The XLA lattice path: winners as ref_select, plus each winner's
    top-nlat in-beam run members (column 0 = the winner itself)."""
    n = len(cand)
    order = np.lexsort((arcs, -cand, fdst))
    sd, sv, sa = fdst[order], cand[order], arcs[order]
    first = np.r_[True, sd[1:] != sd[:-1]]
    val = np.where(first, sv, NEG)
    mx = val.max()
    val = np.where(val > mx - beam, val, NEG)
    top = np.argsort(-val, kind="stable")[:kcap]
    alt_a = np.full((kcap, nlat), -1, np.int64)
    alt_s = np.full((kcap, nlat), NEG, np.float64)
    for k in range(kcap):
        if val[top[k]] <= NEG / 2:
            continue
        i = top[k]
        for j in range(nlat):
            p = i + j
            if p >= n or sd[p] != sd[i]:
                break
            if sv[p] > mx - beam:
                alt_a[k, j] = sa[p]
                alt_s[k, j] = sv[p]
    return val[top], sd[top], alt_a, alt_s


def lat_by_dst(dst, w, alt_a, alt_s):
    """winner dst → ordered valid (score, arc) run members."""
    out = {}
    for k in range(len(dst)):
        if w[k] <= NEG / 2:
            continue
        mem = [(round(float(alt_s[k, j]), 4), int(alt_a[k, j]))
               for j in range(alt_s.shape[1]) if alt_a[k, j] >= 0]
        out[int(dst[k])] = mem
    return out


@pytest.mark.parametrize("beam", [1e9, 3.0])
def test_lattice_mode_matches_sort_path(beam):
    """nlat>0: the kernel's (kcap, nlat) alt layout must equal the XLA
    path's when the conservative certificate holds (q=64 > any lane's
    candidate count → nothing is ever presort-excluded)."""
    rng = np.random.default_rng(21)
    n, kcap, nlat = 2048, 128, 4
    cand = rng.standard_normal(n).astype(np.float32) * 4
    fdst = rng.integers(0, 300, n).astype(np.int32)   # ~7 cands per dst
    arcs = np.arange(n, dtype=np.int32)
    ks, kd, ka, spill = select.recombine_topk(
        jnp.asarray(cand), jnp.asarray(fdst), jnp.asarray(arcs),
        jnp.float32(beam), kcap=kcap, q=64, nlat=nlat)
    assert not bool(spill)
    rw, rd, raa, ras = ref_select_lat(cand, fdst, arcs, beam, kcap, nlat)
    got = lat_by_dst(np.asarray(kd)[:, 0], np.asarray(ks)[:, 0],
                     np.asarray(ka), np.asarray(ks))
    want = lat_by_dst(rd, rw, raa, ras)
    assert got == want
    # winner column == 1-best output of the same call shape
    ks1, kd1, ka1, sp1 = select.recombine_topk(
        jnp.asarray(cand), jnp.asarray(fdst), jnp.asarray(arcs),
        jnp.float32(beam), kcap=kcap, q=64)
    assert pairs(ks[:, 0], kd[:, 0], ka[:, 0]) == pairs(ks1, kd1, ka1)


def test_lattice_mode_conservative_spill():
    """Any in-beam presort exclusion must flag spill in lattice mode
    (an excluded candidate could be some emitted run's alternate)."""
    rng = np.random.default_rng(23)
    n, kcap = 12032, 256
    cand = rng.standard_normal(n).astype(np.float32)
    fdst = rng.integers(0, 5000, n).astype(np.int32)
    arcs = np.arange(n, dtype=np.int32)
    _, _, _, spill = select.recombine_topk(
        jnp.asarray(cand), jnp.asarray(fdst), jnp.asarray(arcs),
        jnp.float32(1e9), kcap=kcap, q=16, nlat=4)
    assert bool(spill)   # 94 in-beam candidates per lane >> q=16


def test_lattice_mode_batched():
    import jax
    rng = np.random.default_rng(29)
    U, n, kcap, nlat = 3, 2048, 128, 2
    cand = rng.standard_normal((U, n)).astype(np.float32) * 4
    fdst = rng.integers(0, 300, (U, n)).astype(np.int32)
    arcs = np.broadcast_to(np.arange(n, dtype=np.int32), (U, n)).copy()
    ks, kd, ka, spill = jax.vmap(
        lambda c, f, a: select.recombine_topk(
            c, f, a, jnp.float32(1e9), kcap=kcap, q=64, nlat=nlat)
    )(jnp.asarray(cand), jnp.asarray(fdst), jnp.asarray(arcs))
    assert ks.shape == (U, kcap, nlat) and not bool(np.asarray(spill).any())
    for u in range(U):
        rw, rd, raa, ras = ref_select_lat(cand[u], fdst[u], arcs[u], 1e9,
                                          kcap, nlat)
        got = lat_by_dst(np.asarray(kd[u])[:, 0], np.asarray(ks[u])[:, 0],
                         np.asarray(ka[u]), np.asarray(ks[u]))
        assert got == lat_by_dst(rd, rw, raa, ras)


def test_duplicate_heavy_recombination():
    """Many candidates per dst: recombination must keep exactly the max
    arc per destination (ties impossible: distinct scores)."""
    rng = np.random.default_rng(3)
    n, kcap = 4096, 128
    fdst = rng.integers(0, 60, n).astype(np.int32)    # ~68 cands per dst
    cand = rng.permutation(n).astype(np.float32) / 97
    arcs = np.arange(n, dtype=np.int32)
    rs, rd, ra = ref_select(cand, fdst, arcs, 1e9, kcap)
    ks, kd, ka, spill = select.recombine_topk(
        jnp.asarray(cand), jnp.asarray(fdst), jnp.asarray(arcs),
        jnp.float32(1e9), kcap=kcap)
    if not bool(spill):
        assert pairs(ks, kd, ka) == pairs(rs, rd, ra)
    else:
        # heavy duplication can legitimately spill; the kept set must
        # still be a subset of the reference winners
        assert set(pairs(ks, kd, ka)) <= set(pairs(rs, rd, ra))


def test_merge_shape_with_neg_padding():
    """The sharded decoder's cross-shard merge (round 5): two per-shard
    top-kcap candidate sets (each already dst-unique WITHIN a shard,
    duplicated ACROSS shards) NEG-padded up to the kernel's 4*LANES
    minimum pool.  Padding must never surface and the merged top-kcap
    must equal the sort reference."""
    rng = np.random.default_rng(9)
    kcap = 128
    sets = []
    for s in range(2):
        d = rng.choice(500, kcap, replace=False).astype(np.int32)
        v = (rng.standard_normal(kcap) * 4).astype(np.float32)
        a = (rng.integers(0, 10_000, kcap)).astype(np.int32)
        sets.append((v, d, a))
    gv = np.concatenate([s[0] for s in sets])
    gd = np.concatenate([s[1] for s in sets])
    ga = np.concatenate([s[2] for s in sets])
    pad = 4 * 128 - len(gv)
    gv = np.concatenate([gv, np.full(pad, select.NEG, np.float32)])
    gd = np.concatenate([gd, np.zeros(pad, np.int32)])
    ga = np.concatenate([ga, np.full(pad, -1, np.int32)])
    rs, rd, ra = ref_select(gv, gd, ga, 1e9, kcap)
    ks, kd, ka, spill = select.recombine_topk(
        jnp.asarray(gv), jnp.asarray(gd), jnp.asarray(ga),
        jnp.float32(1e9), kcap=kcap)
    assert not bool(spill)
    got = pairs(ks, kd, ka)
    assert got == pairs(rs, rd, ra)
    # padding (arc = -1) must never appear among the alive winners
    assert all(a != -1 for *_, a in got)
