#!/bin/sh
# Golden-regeneration runbook (CLAUDE.md): run after ANY change to weights/.
# All stages are CPU f64; safe to run while a TPU job holds the tunnel.
# ~50-60 min on the 2-core host (oracle_golden_par dominates).
set -e
cd "$(dirname "$0")/.."
echo "== accuracy ref (f64 32-scen cold golden) =="
python scripts/accuracy_tpu.py ref
echo "== config3 ref (f64 render->encode->solve golden) =="
python scripts/accuracy_tpu.py ref3
echo "== warm-state capture (f64 closed loop) =="
python scripts/warm_testbed.py ref
echo "== oracle goldens, all six model families =="
python scripts/oracle_golden_par.py --workers "${WORKERS:-2}"
echo "== oracle warm ticks (att) =="
python scripts/oracle_golden.py warm
# per-family warm anchors (advisor r4); WARM_FAMILIES="" skips
for m in ${WARM_FAMILIES-att_tau props rates wrench acc}; do
    echo "== warm capture + oracle ticks ($m) =="
    python scripts/warm_testbed.py ref "$m"
    python scripts/oracle_golden.py warm "$m"
done
echo "== done; spot-check =="
ls -la tests/golden/
