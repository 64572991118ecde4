"""Golden fixed-seed regression tests (SURVEY §4.2): with the reference
unavailable as an executable, fixed-seed parity [B:5] is pinned as
SELF-reproducibility — stored artifacts (loss value + sampled pianorolls at
fixed PRNG seeds, CPU backend) must match bit-for-bit across commits.

Regenerate intentionally with ``python tests/golden_gen.py``.

The build is split per artifact group (golden_gen.build_*) so each test
compiles only its own programs; the HF macro-step pin is slow-tier (its
CG-loop program is the heaviest compile in the old all-at-once fixture —
r5 fast-tier re-budget).
"""

import os

import numpy as np
import pytest

from tests import golden_gen

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")


@pytest.fixture(scope="module")
def core():
    return golden_gen.build_core()


@pytest.fixture(scope="module")
def stored():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file missing — run tests/golden_gen.py")
    return np.load(GOLDEN)


@pytest.mark.parametrize("dec", ["rnn_rbm", "rnn_nade"])
def test_golden_loss(dec, core, stored):
    np.testing.assert_allclose(core[f"{dec}_loss"],
                               stored[f"{dec}_loss"], rtol=1e-6)


@pytest.mark.parametrize("dec", ["rnn_rbm", "rnn_nade"])
def test_golden_generation_bit_exact(dec, core, stored):
    np.testing.assert_array_equal(core[f"{dec}_roll"],
                                  stored[f"{dec}_roll"])


@pytest.mark.slow
def test_golden_hf_macro_step(stored):
    """Flagship-surface pin (VERDICT r3 #6): one Hessian-free macro-step's
    metrics tuple (loss, rho, lambda, q, accepted, grad_norm) must
    reproduce across commits — a silent CG/GGN regression moves these."""
    if "hf_macro_metrics" not in stored:
        pytest.skip("regenerate golden.npz (tests/golden_gen.py)")
    np.testing.assert_allclose(golden_gen.build_hf()["hf_macro_metrics"],
                               stored["hf_macro_metrics"],
                               rtol=1e-5, atol=1e-7)


def test_golden_accompaniment(stored):
    """Accompaniment pin: the track-conditional sampling path's RNG
    contract (per-track keys tkeys[track], subset sampling) must reproduce
    across commits."""
    if "accomp_roll" not in stored:
        pytest.skip("regenerate golden.npz (tests/golden_gen.py)")
    np.testing.assert_array_equal(golden_gen.build_accomp()["accomp_roll"],
                                  stored["accomp_roll"])


def test_golden_dbn_flagship(stored):
    if "dbn_loss" not in stored:
        pytest.skip("regenerate golden.npz (tests/golden_gen.py)")
    current = golden_gen.build_dbn()
    np.testing.assert_allclose(current["dbn_loss"], stored["dbn_loss"],
                               rtol=1e-6)
    np.testing.assert_array_equal(current["dbn_roll"], stored["dbn_roll"])
