"""Opt-in CL learning-effect test: the qualitative method ordering of
docs/RESULTS.md's 3-task protocol must hold (VERDICT r2 next #4 — e2e
previously proved "runs", not "learns").

Deselected by default (pytest.ini `-m "not slow"`); run with:

    python -m pytest tests/test_protocol_ordering.py -m slow -q

~10 min CPU: three full 3-task continual runs (CE fine-tuning, MiB, BACS)
through scripts/protocol_compare.py's seeded protocol.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.slow


def test_cl_methods_beat_finetuning_on_oldest_task():
    from scripts.protocol_compare import PROTOCOLS, run_method

    p = PROTOCOLS["3task"]
    results = {m: run_method(p, m, seed=42) for m in ("ce", "mib", "bacs")}
    ce_old = results["ce"]["oldest_task_miou"]
    assert ce_old < 0.35, f"fine-tuning unexpectedly retains {ce_old}"
    # the RESULTS.md qualitative ordering: CL methods retain the oldest task
    # at > 3x plain fine-tuning
    for m in ("mib", "bacs"):
        old = results[m]["oldest_task_miou"]
        assert old > 3 * ce_old, (
            f"{m} oldest-task mIoU {old} vs CE {ce_old}: retention collapsed"
        )
        assert results[m]["final_miou"] > results["ce"]["final_miou"]


def test_flagship_15_1_retention_ordering():
    """FLAGSHIP-scale CL evidence (VERDICT r3 next #1): DeepLabV3 through
    all 6 tasks of the 15-1 protocol on the rich synthetic source must be
    non-degenerate (task-0 trains to >= 0.5 val mIoU) and show the
    retention ordering BACS+/MiB >> BACS >> CE fine-tuning.  ~70 min on a
    v5e chip (also runs on CPU, much slower).  Reproduces docs/RESULTS.md's
    flagship table at reduced epochs."""
    from scripts.protocol_compare import PROTOCOLS, run_method

    p = dict(PROTOCOLS["15-1-flagship"])
    results = {
        m: run_method(p, m, seed=42, network="deeplab", backbone="resnet50")
        for m in ("ce", "mib", "bacs", "bacs_plus")
    }
    ce_old = results["ce"]["oldest_task_miou"]
    # non-degeneracy: the flagship model actually LEARNS task 0
    # (the r3 flat-source protocol collapsed to ~0.03 here)
    assert results["ce"]["task0_miou"] > 0.5, results["ce"]
    assert ce_old < 0.35, f"fine-tuning unexpectedly retains {ce_old}"
    # measured r4 (docs/RESULTS.md): CE 0.068 / BACS 0.197 (2.9x) /
    # BACS+ 0.684 (10.1x) / MiB 0.737 (10.8x) — threshold 2.5x keeps
    # headroom under seed noise
    for m in ("mib", "bacs", "bacs_plus"):
        old = results[m]["oldest_task_miou"]
        assert old > 2.5 * ce_old, (
            f"{m} oldest-task mIoU {old} vs CE {ce_old}: retention collapsed"
        )
        assert results[m]["final_miou"] > results["ce"]["final_miou"]
    # the paper's hyperparameters (alpha=0.8 + seen-gated bg_weighted_ce,
    # reference conf/experiments/loss/bacs_plus.yaml) are load-bearing:
    # measured 0.660 final / 0.684 oldest vs plain BACS's 0.186/0.197
    assert results["bacs_plus"]["oldest_task_miou"] > 0.4
    assert results["bacs_plus"]["final_miou"] > 0.4


def test_flagship_15_1_all_methods_beat_ce():
    """Round-5 extension (VERDICT r4 next #1): the remaining four reference
    methods (PLOP, SDR, ER, iCaRL) through the SAME flagship protocol.
    Measured on v5e seed 42 (docs/RESULTS.md round 5): ER 0.256 / PLOP
    0.488 / iCaRL 0.563 / SDR 0.737 final mIoU vs CE 0.069 — every method
    must stay non-degenerate on task 0 and beat CE fine-tuning on both
    final mIoU and oldest-task retention.  ~60 min on a v5e chip."""
    from scripts.protocol_compare import PROTOCOLS, run_method

    p = dict(PROTOCOLS["15-1-flagship"])
    results = {
        m: run_method(p, m, seed=42, network="deeplab", backbone="resnet50")
        for m in ("ce", "er", "plop", "icarl", "sdr")
    }
    ce = results["ce"]
    assert ce["task0_miou"] > 0.5, ce
    assert ce["oldest_task_miou"] < 0.35, ce
    for m in ("er", "plop", "icarl", "sdr"):
        r = results[m]
        assert r["task0_miou"] > 0.5, (m, r)
        assert r["final_miou"] > 2 * ce["final_miou"], (m, r)
        assert r["oldest_task_miou"] > 2 * ce["oldest_task_miou"], (m, r)
    # measured margins (keep headroom under seed noise): the distillation
    # methods clear the raw-replay baseline, SDR leads
    assert results["sdr"]["final_miou"] > results["er"]["final_miou"]
    assert results["icarl"]["final_miou"] > results["er"]["final_miou"]


def test_cooccur_background_shift_crossover():
    """Round-5 controlled background-shift regime (VERDICT r4 next #2):
    with era-structured data (unlabeled old-class instances planted in
    new-task images at rate 0.5 + per-era background appearance drift,
    disjoint membership) the paper's BACS >= MiB ordering must reproduce
    at FLAGSHIP scale.  Measured v5e seed 42 (docs/RESULTS.md round 5):
    CE 0.080/0.053, MiB 0.119/0.136, BACS+ 0.260/0.472 final/oldest —
    BACS+ retains 3.5x MiB.  ~45 min on a v5e chip."""
    from scripts.protocol_compare import PROTOCOLS, run_method

    p = dict(PROTOCOLS["15-1-flagship"])
    shift = (
        "training.mode=disjoint",
        "+dataset.dataset.cooccur=0.5",
        "+dataset.dataset.bg_drift=true",
    )
    res = {
        m: run_method(p, m, seed=42, network="deeplab", backbone="resnet50",
                      extra_overrides=shift)
        for m in ("ce", "mib", "bacs_plus")
    }
    # non-degenerate: task 0 still trains in the era regime
    assert res["ce"]["task0_miou"] > 0.5, res["ce"]
    # the crossover, with margin (measured 2.2x final / 3.5x oldest)
    assert res["bacs_plus"]["final_miou"] > 1.5 * res["mib"]["final_miou"], res
    assert (res["bacs_plus"]["oldest_task_miou"]
            > 2 * res["mib"]["oldest_task_miou"]), res
    for m in ("mib", "bacs_plus"):
        assert res[m]["final_miou"] > res["ce"]["final_miou"]


def test_voc_grid_disjoint_ordering_crossover():
    """Round-5 scenario-grid guard (VERDICT r4 next #3 / weak #1): on the
    15-1 DISJOINT cell the paper's BACS >= MiB ordering reproduces
    (measured v5e seed 42: BACS 0.156 vs MiB 0.114 final mIoU — the
    seen-detector regime), while both still beat CE fine-tuning (0.032).
    Also pins the provable MiB mode-invariance: unbiased CE folds old
    labels into bg (ops/losses.py:126), so sequential MiB must equal
    disjoint MiB exactly.  ~15 min on a v5e chip."""
    from scripts.protocol_compare import PROTOCOLS, run_method

    p = dict(PROTOCOLS["15-1"])
    res = {
        m: run_method(p, m, seed=42,
                      extra_overrides=("training.mode=disjoint",))
        for m in ("ce", "bacs", "mib")
    }
    assert res["ce"]["final_miou"] < 0.08, res["ce"]
    assert res["bacs"]["final_miou"] > 2 * res["ce"]["final_miou"]
    assert res["mib"]["final_miou"] > 2 * res["ce"]["final_miou"]
    # the crossover: BACS ahead of MiB once membership is disjoint
    assert res["bacs"]["final_miou"] > res["mib"]["final_miou"], res
    # MiB sequential == disjoint (label-table invariance, bit-level)
    seq = run_method(p, "mib", seed=42,
                     extra_overrides=("training.mode=sequential",))
    assert seq["final_miou"] == pytest.approx(res["mib"]["final_miou"], abs=1e-9)
    assert seq["avg_iou_per_dataset"] == res["mib"]["avg_iou_per_dataset"]
