#!/bin/sh
# The rest of the author-run VOC scenario grid (reference:
# scripts/voc/slurm_train.sh:68-87) at UNet debug scale, on-chip:
# protocols 10-1 / 15-5 / 19-1 (overlap) and the 15-1 membership-mode
# axis (disjoint, sequential). Serialized: one tpu process at a time.
#
# Idempotent/resumable: a leg whose log already contains the final
# method summary (the `"method": "mib"` JSON line is printed last) is
# skipped, so an interrupted grid re-run picks up where it stopped.
set -e
cd "$(dirname "$0")/.."
for p in 10-1 15-5 19-1; do
    if grep -qs '"method": "mib"' "/tmp/grid_${p}.log"; then
        echo "skip ${p}: complete log exists"
        continue
    fi
    python scripts/protocol_compare.py --protocol "$p" --methods ce,bacs,mib \
        > "/tmp/grid_${p}.log" 2>&1
done
for m in disjoint sequential; do
    if grep -qs '"method": "mib"' "/tmp/grid_15-1_${m}.log"; then
        echo "skip 15-1 ${m}: complete log exists"
        continue
    fi
    python scripts/protocol_compare.py --protocol 15-1 --methods ce,bacs,mib \
        --mode "$m" > "/tmp/grid_15-1_${m}.log" 2>&1
done
echo GRID_DONE
