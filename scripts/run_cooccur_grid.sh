#!/bin/sh
# Background-shift ordering experiment (VERDICT r4 next #2): does the
# paper's BACS >= MiB ordering reproduce once new-task images carry
# unlabeled old-class instances (true background shift — the regime the
# seen-detector targets, reference: loss/bacs_loss.py:258-294) and the
# new-era background appearance drifts (violating MiB's bg-is-a-mixture
# assumption)?  CE / MiB / BACS+ at two co-occurrence rates, flagship
# scale, serialized (one TPU process at a time).
#
# Membership mode DISJOINT: with overlap, any new-era image carrying a
# planted old-class instance would also join task 0 (it contains old
# classes), polluting the base task with drifted backgrounds; disjoint
# gives task t exactly era-t's images (test_cooccur_disjoint_split_is_
# era_exact) — the clean shift regime.
set -e
cd "$(dirname "$0")/.."
for rate in 0.5 0.9; do
    python scripts/protocol_compare.py --protocol 15-1-flagship \
        --methods ce,mib,bacs_plus --mode disjoint \
        --override "+dataset.dataset.cooccur=${rate}" \
        --override "+dataset.dataset.bg_drift=true" \
        > "/tmp/cooccur_${rate}.log" 2>&1
done
echo COOCCUR_DONE
