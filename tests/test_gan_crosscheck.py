"""Cross-framework GAN collapse contract (VERDICT r4 items 1+8).

Asserts the trajectory-shape agreement recorded in gan_crosscheck.json
(scripts/gan_crosscheck.py): the torch reference DCGAN and our GAN, trained
on the identical fallback dataset with the identical batch order, both
exhibit the same failure mode — the discriminator dominates (its loss
collapses from the ~1.4 init level toward 0) while the generator loss is
driven up. This pins the round-4 open question: the 50-epoch collapse is
data-borne, not a framework bug. The short-horizon numeric band lives in
tests/parity_common.py (BAND['gan']); this file owns the long-horizon
shape contract.

Reference trained by scripts/gan_crosscheck.py --ref
(/root/reference/gms/gans/gan.py:27-54 semantics, torch CPU).
"""

import json
from pathlib import Path

import numpy as np
import pytest

ART = Path(__file__).resolve().parent.parent / 'gan_crosscheck.json'


@pytest.fixture(scope='module')
def cross():
    if not ART.exists():
        pytest.skip('gan_crosscheck.json not recorded')
    return json.loads(ART.read_text())


def _at(rec, lo, hi=None):
    """Values of a side's disc/gen losses for checkpoints in [lo, hi]."""
    hi = hi if hi is not None else float('inf')
    idx = [i for i, s in enumerate(rec['steps']) if lo <= s <= hi]
    return (
        np.array([rec['disc_loss'][i] for i in idx]),
        np.array([rec['gen_loss'][i] for i in idx]),
    )


def test_both_frameworks_start_at_the_same_level(cross):
    """Early window (steps <= 200): disc loss the same order on both sides
    — the init-level contract that caught the round-1..4 BN-scale init
    deviation (ours_legacy starts at 1.31 vs the reference's 0.81 because
    zero-centered BN scales strangle the first discriminator updates)."""
    ref_d, _ = _at(cross['reference'], 0, 200)
    our_d, _ = _at(cross['ours'], 0, 200)
    assert ref_d.size and our_d.size
    assert np.mean(our_d) < 3.0 * np.mean(ref_d)
    assert np.mean(ref_d) < 3.0 * np.mean(our_d)


def test_both_frameworks_disc_dominate(cross):
    """Collapse direction: by the late checkpoints (>= 1400 steps) BOTH
    discriminators have crushed their loss an order of magnitude below the
    ~1.39 init level (ln 4: two fresh BCE terms) while BOTH generator
    losses are driven above their ~0.69 init level."""
    for side in ('reference', 'ours'):
        d, g = _at(cross[side], 1400)
        assert d.size >= 2, f'{side}: too few late checkpoints'
        assert d.min() < 0.15, f'{side}: disc never dominated ({d})'
        assert g.max() > 2.0, f'{side}: gen loss never driven up ({g})'


def test_trajectory_shape_tracks(cross):
    """Monotone-ish descent into domination on both sides: the late-window
    disc mean is far below the early-window mean (>= 4x drop) for both
    frameworks — same shape, not coincidental endpoints."""
    for side in ('reference', 'ours'):
        early_d, _ = _at(cross[side], 0, 200)
        late_d, _ = _at(cross[side], 1400)
        assert np.mean(early_d) > 4.0 * np.mean(late_d), (
            f'{side}: no collapse trajectory '
            f'({np.mean(early_d):.3f} -> {np.mean(late_d):.3f})'
        )


def test_reference_fid_peaks_then_collapses(cross):
    """Quality signature, same scorer both sides (shipped autoencoder
    arbiter): the torch reference's sample FID improves early (min < 0.2)
    and then collapses hard (final > 0.5) — the 'best epoch is early,
    shipped endpoint is degenerate' pattern RESULTS.json records for our
    50-epoch run (fid_best 0.081@10 -> 0.787@50), reproduced by the
    reference itself on the same data. Motivates --keep_best=fid."""
    rec = cross['reference']
    fids = rec.get('fid')
    if not fids:
        pytest.skip('reference samples not FID-scored yet (--score)')
    assert min(fids) < 0.2, f'reference never reached a good FID ({fids})'
    assert fids[-1] > 0.5, f'reference FID never collapsed ({fids})'
    our_fids = cross['ours']['fid']
    assert our_fids[-1] > 0.5, 'our final FID did not collapse like the ref'


def test_legacy_init_recorded_for_the_record(cross):
    """The round-1..4 zero-centered BN-scale init deviation is archived:
    its early disc loss sits ABOVE the corrected init's (strangled
    discriminator learns slower), and it still ends in the same
    disc-domination regime — the init bug changed the pace, not the
    data-borne outcome."""
    if 'ours_legacy' not in cross:
        pytest.skip('legacy trajectory not recorded')
    leg_d, _ = _at(cross['ours_legacy'], 0, 200)
    fix_d, _ = _at(cross['ours'], 0, 200)
    assert np.mean(leg_d) > np.mean(fix_d)
    late_d, late_g = _at(cross['ours_legacy'], 1400)
    assert late_d.min() < 0.15 and late_g.max() > 2.0


def test_collapse_window_semantics():
    """scripts/collect_gan_sweep.py::collapse_window: first >=2-epoch
    streak below threshold; 1-epoch dips are noise; recovered iff the
    streak breaks before the run ends."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'scripts'))
    from collect_gan_sweep import collapse_window

    # round-5 corrected-init default: collapse 1..22, escape at 23
    run = [(0, 0.5)] + [(e, 0.001) for e in range(1, 23)] + [
        (e, 0.12 if e % 2 else 0.05) for e in range(23, 51)
    ]
    assert collapse_window(run) == (1, 22, True)
    # legacy init: collapse 2..50, never recovers
    run = [(0, 1.3), (1, 0.4)] + [(e, 0.001) for e in range(2, 51)]
    assert collapse_window(run) == (2, 50, False)
    # slowdisc: a single-epoch dip is not a collapse
    run = [(e, 0.4) for e in range(8)] + [(8, 0.05)] + [
        (e, 0.4) for e in range(9, 51)
    ]
    assert collapse_window(run) == (None, None, None)
    # healthy run
    assert collapse_window([(e, 0.6) for e in range(10)]) == (None, None, None)
