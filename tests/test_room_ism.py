"""Golden image-source room model checks (SURVEY.md §7 step 1: the
reverberant eval corpus generator; VERDICT r2 missing #2)."""

import numpy as np

from golden import room as groom

SR = 16000.0
C = 343.0
ROOM = np.array([5.0, 4.0, 3.0])


def test_image_counts_and_amplitudes():
    s = np.array([2.5, 1.5, 1.0])
    imgs, amps = groom.image_sources(s, ROOM, 0, 0.7)
    assert len(imgs) == 1 and amps[0] == 1.0
    np.testing.assert_allclose(imgs[0], s)
    imgs, amps = groom.image_sources(s, ROOM, 1, 0.7)
    # direct + one image per wall
    assert len(imgs) == 7
    assert sorted(np.round(amps, 6)) == [0.7] * 6 + [1.0]
    imgs2, amps2 = groom.image_sources(s, ROOM, 2, 0.7)
    # + 6 same-axis double bounces + 12 cross-axis = 25
    assert len(imgs2) == 25
    assert np.isclose(sorted(amps2)[0], 0.49)


def test_order0_in_room_equals_anechoic_up_to_spreading():
    """β=0 / order 0 inside a room == the anechoic point source, up to the
    per-mic 1/r spreading gain (the anechoic model carries delays only)."""
    rng = np.random.default_rng(0)
    src = rng.standard_normal(4000)
    POS = np.stack([np.linspace(-0.1, 0.1, 4), np.zeros(4), np.zeros(4)], 1)
    pos = np.array([0.5, 1.5, 0.0])
    an = groom.simulate(src, POS, pos, SR, snr_db=None)
    o0 = groom.simulate(src, POS, pos, SR, snr_db=None, room_dim=ROOM,
                        max_order=0, reflect=0.9)
    center = ROOM / 2
    d0 = np.linalg.norm(pos)
    for i in range(4):
        d = np.linalg.norm(center + pos - (center + POS[i]))
        assert np.max(np.abs(o0[i] - an[i] * (d0 / d))) < 1e-10


def test_single_floor_reflection_analytic():
    """One reflective wall (the floor): output == direct + one delayed,
    attenuated, 1/r-scaled copy — built by hand from frac_delay."""
    rng = np.random.default_rng(1)
    src = rng.standard_normal(4000)
    POS = np.zeros((1, 3))
    pos = np.array([0.5, 1.5, 0.0])
    beta = 0.8
    refl = np.array([0.0, 0.0, 0.0, 0.0, beta, 0.0])   # floor (z=0) only
    out = groom.simulate(src, POS, pos, SR, snr_db=None, room_dim=ROOM,
                         max_order=1, reflect=refl)
    center = ROOM / 2
    img = (center + pos).copy()
    img[2] = -img[2]
    d0 = np.linalg.norm(pos)
    dm = np.linalg.norm(center + POS[0] - (center + pos))
    di = np.linalg.norm(center + POS[0] - img)
    exp = ((d0 / dm) * groom.frac_delay(src, (dm - d0) / C * SR)
           + beta * (d0 / di) * groom.frac_delay(src, (di - d0) / C * SR))
    assert np.max(np.abs(out[0] - exp)) < 1e-10


def test_reverb_adds_energy_and_tail():
    """Reflections add energy, and the room impulse response has a tail:
    truncating the source leaves post-offset energy in the room output."""
    rng = np.random.default_rng(2)
    src = np.zeros(4000)
    src[:2000] = rng.standard_normal(2000)
    POS = np.zeros((1, 3))
    pos = np.array([0.8, 1.2, 0.3])
    dry = groom.simulate(src, POS, pos, SR, snr_db=None, room_dim=ROOM,
                         max_order=0)
    wet = groom.simulate(src, POS, pos, SR, snr_db=None, room_dim=ROOM,
                         max_order=2, reflect=0.9)
    assert np.sum(wet**2) > 1.2 * np.sum(dry**2)
    tail = slice(2200, 4000)   # > 10 ms after source offset
    assert np.sum(wet[0, tail] ** 2) > 10 * np.sum(dry[0, tail] ** 2)
