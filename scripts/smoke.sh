#!/usr/bin/env bash
# Smoke gate: the `-m "not slow"` suite split into three balanced shards
# run in PARALLEL (pytest-xdist is not available in this environment;
# three pytest processes with their own local[4] Spark sessions are).
# Shard 1 carries the oracle differential + the XLSX source/sink surface;
# shard 2 the ANN/similarity family (the heaviest operator suites);
# shard 3 the rest of the operator library. Fails if any shard fails.
# Measured round 7: ~6 min wall (slowest shard). Serial fallback:
# `python -m pytest tests/ -q -m "not slow"` (~10 min). Full suite:
# `python -m pytest tests/ -q` (~17 min, 529 tests).
set -u
cd "$(dirname "$0")/.."

SHARD1=(tests/test_queries_oracle.py tests/test_xlsx_reader.py
        tests/test_xlsx_sink.py tests/test_xlsx_dates.py
        tests/test_xlsx_inline.py tests/test_xlsx_pruning.py
        tests/test_xlsx_pushdown.py tests/test_xlsx_udtf.py
        tests/test_xlsx_roundtrip_property.py)
SHARD2=(tests/test_similarity.py tests/test_pq.py
        tests/test_ivf_index.py tests/test_ivfpq_index.py
        tests/test_semantic_dedup.py)

IGNORES=()
for f in "${SHARD1[@]}" "${SHARD2[@]}"; do IGNORES+=("--ignore=$f"); done

python -m pytest -q -m "not slow" "${SHARD1[@]}" >/tmp/smoke_shard1.log 2>&1 &
PID1=$!
python -m pytest -q -m "not slow" "${SHARD2[@]}" >/tmp/smoke_shard2.log 2>&1 &
PID2=$!
python -m pytest -q -m "not slow" tests/ "${IGNORES[@]}" >/tmp/smoke_shard3.log 2>&1 &
PID3=$!

FAIL=0
wait "$PID1" || FAIL=1
wait "$PID2" || FAIL=1
wait "$PID3" || FAIL=1
tail -2 /tmp/smoke_shard1.log
tail -2 /tmp/smoke_shard2.log
tail -2 /tmp/smoke_shard3.log
if [ "$FAIL" -ne 0 ]; then
  echo "SMOKE FAILED — see /tmp/smoke_shard{1,2,3}.log"
  exit 1
fi
echo "SMOKE OK"
