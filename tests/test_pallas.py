"""Pallas kernel parity gates (run in interpreter mode on the CPU harness;
the same kernels are validated compiled-on-TPU by the verify drives)."""

import numpy as np
import pytest

from golden import room as groom
from dsr_tpu.config import ArrayGeometry, FilterbankConfig
from dsr_tpu.ops import beamforming as jbf
from dsr_tpu.ops import filterbank as jfb
from dsr_tpu.ops.pallas import filterbank as pfb
from dsr_tpu.ops.pallas import gsc as pgsc
from dsr_tpu.ops.pallas import steering as psteer
from dsr_tpu.ops.pallas import viterbi as pvit
from dsr_tpu.utils.hostxfer import from_host, to_host

SR = 16000.0
CFG = FilterbankConfig(M=256, m=4, r=2)  # D=128: Pallas-supported config


def test_analysis_matches_xla():
    x = np.random.default_rng(0).standard_normal((2, 20000)).astype(np.float32)
    A_x = to_host(jfb.analysis(x, CFG))
    A_p = to_host(pfb.analysis(x, CFG))
    assert A_x.shape == A_p.shape
    assert np.max(np.abs(A_x - A_p)) / np.max(np.abs(A_x)) < 1e-5


def test_synthesis_matches_xla_and_reconstructs():
    x = np.random.default_rng(1).standard_normal(20000).astype(np.float32)
    A = jfb.analysis(x, CFG)
    y_x = np.asarray(jfb.synthesis(A, CFG, len(x)))
    y_p = np.asarray(pfb.synthesis(A, CFG, len(x)))
    assert np.max(np.abs(y_x - y_p)) / np.max(np.abs(y_x)) < 1e-5
    err_db = 20 * np.log10(np.max(np.abs(y_p - x)) / np.max(np.abs(x)))
    assert err_db < -50.0


def test_unsupported_config_asserts():
    bad = FilterbankConfig(M=64, m=4, r=2)  # D=32 < 128
    x = np.zeros(1000, np.float32)
    with pytest.raises(AssertionError):
        pfb.analysis(x, bad)


def test_fused_analysis_beamform_matches_unfused():
    """analysis_beamform == apply_weights(analysis(x), w) for MVDR weights,
    across tile boundaries and batch staging."""
    N = 6
    POS = np.asarray(ArrayGeometry.circular(N, 0.10).positions)
    rng = np.random.default_rng(7)
    taus = (groom.steering_delays(POS, np.array([0.0, 2.0, 0.0]), 343.0, SR) / SR).astype(
        np.float32
    )
    Gamma = jbf.diffuse_coherence(POS, CFG.M, SR, 343.0)
    import jax.numpy as jnp

    w = jbf.mvdr_weights(jbf.steering_vectors(jnp.asarray(taus), CFG.M, SR), Gamma)
    x = rng.standard_normal((N, 40960)).astype(np.float32)  # T=313 → 2 tiles
    Y_ref = to_host(jbf.apply_weights(jfb.analysis(x, CFG), w))
    Y_fused = to_host(pfb.analysis_beamform(jnp.asarray(x), w, CFG))
    assert Y_fused.shape == Y_ref.shape
    assert np.max(np.abs(Y_fused - Y_ref)) / np.max(np.abs(Y_ref)) < 1e-5


def test_fused_analysis_beamform_staged_bank():
    """Scalar-prefetched buffer index selects the right staged utterance,
    and the bf16x3 precision mode stays within the allclose gate."""
    import jax.numpy as jnp

    N, S = 4, 20000
    POS = np.asarray(ArrayGeometry.circular(N, 0.08).positions)
    rng = np.random.default_rng(8)
    taus = (groom.steering_delays(POS, np.array([1.0, 1.5, 0.0]), 343.0, SR) / SR).astype(
        np.float32
    )
    v = jbf.steering_vectors(jnp.asarray(taus), CFG.M, SR)
    w = jbf.ds_weights(v)
    xs = rng.standard_normal((3, N, S)).astype(np.float32)
    xp = pfb.stage_for_beamform(jnp.asarray(xs), CFG)
    for b in (0, 2):
        Y_ref = to_host(jbf.apply_weights(jfb.analysis(xs[b], CFG), w))
        for prec in ("highest", "bf16x3"):
            Y = to_host(
                pfb.analysis_beamform_staged(xp, b, w, CFG, S, precision=prec)
            )
            tol = 1e-5 if prec == "highest" else 3e-5
            assert np.max(np.abs(Y - Y_ref)) / np.max(np.abs(Y_ref)) < tol


def _gsc_scan_ref(X, wq, B, mu):
    """XLA-scan GSC reference, explicit (jbf.gsc_nlms dispatches to the
    Pallas kernel on TPU, which would compare the kernel to itself)."""
    import jax.numpy as jnp

    Y, wa = jbf._gsc_scan(
        jnp.transpose(from_host(X), (1, 2, 0)), from_host(wq), from_host(B),
        jnp.float32(mu), jnp.float32(1e-6), jnp.float32(10.0), None,
    )
    return to_host(Y), to_host(wa)


def test_gsc_kernel_matches_scan():
    M = 64
    POS = np.asarray(ArrayGeometry.linear(4, 0.04).positions)
    rng = np.random.default_rng(2)
    N, T, K = 4, 40, M // 2 + 1
    taus = groom.steering_delays(POS, np.array([0.0, 1.0, 0.0]), 343.0, SR) / SR
    vd = jbf.steering_vectors(taus.astype(np.float32), M, SR)
    v = to_host(vd)
    wq = v / N
    B = to_host(jbf.blocking_matrix(vd))
    X = (rng.standard_normal((N, T, K)) + 1j * rng.standard_normal((N, T, K))).astype(
        np.complex64
    )
    Y_ref, wa_ref = _gsc_scan_ref(X, wq, B, 0.1)
    Xd, wqd, Bd = from_host(X), from_host(wq), from_host(B)
    Y_pal, wa_pal = pgsc.gsc_nlms(Xd, wqd, Bd, mu=0.1)
    Y_pal, wa_pal = to_host(Y_pal), to_host(wa_pal)
    assert np.max(np.abs(Y_pal - Y_ref)) / np.max(np.abs(Y_ref)) < 1e-5
    assert np.max(np.abs(wa_pal - wa_ref)) < 1e-5
    # wa0 threading: decode the second half seeded with the first half's
    # weights == one full pass
    Y1, wa1 = pgsc.gsc_nlms(Xd[:, : T // 2], wqd, Bd, mu=0.1)
    Y2, wa2 = pgsc.gsc_nlms(Xd[:, T // 2 :], wqd, Bd, mu=0.1, wa0=wa1)
    assert np.max(np.abs(np.concatenate([to_host(Y1), to_host(Y2)])
                         - Y_pal)) < 1e-5
    assert np.max(np.abs(to_host(wa2) - wa_pal)) < 1e-5


def test_steering_kernel_matches_composed_ops():
    M = 64
    POS = np.asarray(ArrayGeometry.linear(6, 0.05).positions)
    rng = np.random.default_rng(3)
    N, T, K = 6, 30, M // 2 + 1
    taus = (groom.steering_delays(POS, np.array([0.5, 1.5, 0.0]), 343.0, SR) / SR).astype(
        np.float32
    )
    X = (rng.standard_normal((N, T, K)) + 1j * rng.standard_normal((N, T, K))).astype(
        np.complex64
    )
    v = jbf.steering_vectors(taus, M, SR)
    Xd = from_host(X)
    Y_ref = to_host(jbf.apply_weights(Xd, jbf.ds_weights(v)))
    Y_pal = to_host(psteer.ds_beamform(Xd, taus, M, SR))
    assert np.max(np.abs(Y_pal - Y_ref)) / np.max(np.abs(Y_ref)) < 1e-4


def test_steering_kernel_time_varying_delays():
    """Per-frame delay trajectories (tracking front end) are supported."""
    M = 64
    POS = np.asarray(ArrayGeometry.linear(4, 0.05).positions)
    rng = np.random.default_rng(4)
    N, T, K = 4, 20, M // 2 + 1
    X = (rng.standard_normal((N, T, K)) + 1j * rng.standard_normal((N, T, K))).astype(
        np.complex64
    )
    taus_t = np.stack(
        [
            groom.steering_delays(POS, np.array([0.5 + 0.01 * t, 1.5, 0.0]), 343.0, SR) / SR
            for t in range(T)
        ]
    ).astype(np.float32)
    Xd = from_host(X)
    Y_pal = to_host(psteer.ds_beamform(Xd, taus_t, M, SR))
    # frame t must equal the static-steering result at taus_t[t]
    for t in [0, T // 2, T - 1]:
        v = jbf.steering_vectors(taus_t[t], M, SR)
        y_t = to_host(jbf.apply_weights(Xd[:, t : t + 1], jbf.ds_weights(v)))[0]
        assert np.max(np.abs(Y_pal[t] - y_t)) / np.max(np.abs(y_t)) < 1e-4


def test_banded_viterbi_kernel_matches_dense():
    from golden import gmm_hmm as ggh

    rng = np.random.default_rng(5)
    T, S = 60, 37
    ll = rng.standard_normal((T, S))
    self_lp = np.log(0.6) * np.ones(S)
    adv_lp = np.log(0.4) * np.ones(S)
    # dense reference on the same banded graph
    A = np.full((S, S), -1e30)
    np.fill_diagonal(A, self_lp)
    for s in range(S - 1):
        A[s, s + 1] = adv_lp[s + 1]
    init = np.full(S, -1e30)
    init[0] = 0.0
    final = np.full(S, -1e30)
    final[S - 1] = 0.0
    p_ref, s_ref = ggh.viterbi_dense(ll, A, init, final)
    p_pal, s_pal = pvit.banded_viterbi(
        ll.astype(np.float32), self_lp.astype(np.float32), adv_lp.astype(np.float32)
    )
    assert abs(float(s_pal) - s_ref) < 1e-2
    np.testing.assert_array_equal(np.asarray(p_pal), p_ref)


def test_gsc_kernel_batched_matches_scan():
    """Batched utterances (per-utterance steering) adapt independently
    inside one kernel call."""
    M = 64
    POS = np.asarray(ArrayGeometry.linear(4, 0.04).positions)
    rng = np.random.default_rng(9)
    Bb, N, T, K = 3, 4, 30, M // 2 + 1
    wqs, Bs, Xs, refs = [], [], [], []
    for b in range(Bb):
        taus = groom.steering_delays(
            POS, np.array([0.3 * b - 0.3, 1.0, 0.0]), 343.0, SR) / SR
        vd = jbf.steering_vectors(taus.astype(np.float32), M, SR)
        v = to_host(vd)
        wq = v / N
        Bm = to_host(jbf.blocking_matrix(vd))
        X = (rng.standard_normal((N, T, K)) + 1j * rng.standard_normal((N, T, K))
             ).astype(np.complex64)
        Y_ref, _ = _gsc_scan_ref(X, wq, Bm, 0.1)
        wqs.append(wq); Bs.append(Bm); Xs.append(X); refs.append(Y_ref)
    Y_pal = to_host(pgsc.gsc_nlms(
        from_host(np.stack(Xs)), from_host(np.stack(wqs)),
        from_host(np.stack(Bs)), mu=0.1)[0])
    ref = np.stack(refs)
    assert Y_pal.shape == ref.shape
    assert np.max(np.abs(Y_pal - ref)) / np.max(np.abs(ref)) < 1e-5


def test_split_mm_exact_for_ids():
    """The 2-pass bf16 one-hot lookup must be EXACT for integer table
    values up to 2^17 — on the chip, XLA's excess-precision fold turns
    the residual pass into zero unless the hi half is barriered
    (topk_decoder._split_mm docstring; round-4 split-decoder bug)."""
    import jax
    import jax.numpy as jnp
    from dsr_tpu.asr.decoder.topk_decoder import _split_mm

    rng = np.random.default_rng(0)
    K, C = 256, 4
    tab = rng.integers(0, 1 << 17, (K, C)).astype(np.float32)
    te = rng.integers(0, K, 512).astype(np.int32)
    oh = (te[:, None] == np.arange(K)[None, :]).astype(np.float32)
    out = np.asarray(jax.jit(
        lambda o, t: _split_mm(o, t, "ek,kc->ec"))(jnp.asarray(oh),
                                                   jnp.asarray(tab)))
    assert float(np.max(np.abs(out - tab[te]))) == 0.0
