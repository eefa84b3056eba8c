#!/bin/bash
# Orchestrate the 2-executor standalone smoke (VERDICT r13 #7):
# start a standalone master + two worker JVMs on this host, run
# tools/standalone_smoke.py against it, then tear everything down.
# Output: one JSON line on stdout (also usable as STANDALONE_rNN.json).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SPARK_BIN="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin"))')"
LOGDIR="${TMPDIR:-/tmp}/standalone_smoke_$$"
mkdir -p "$LOGDIR"
CORES="${SMOKE_EXEC_CORES:-8}"
MEM="${SMOKE_EXEC_MEM:-6g}"

"$SPARK_BIN/spark-class" org.apache.spark.deploy.master.Master \
    -h 127.0.0.1 -p 7077 --webui-port 8091 \
    > "$LOGDIR/master.log" 2>&1 &
MASTER_PID=$!
sleep 5
W_PIDS=()
for i in 1 2; do
    SPARK_WORKER_DIR="$LOGDIR/worker$i" \
    "$SPARK_BIN/spark-class" org.apache.spark.deploy.worker.Worker \
        "spark://127.0.0.1:7077" -c "$CORES" -m "$MEM" \
        --webui-port "809$((i+1))" \
        > "$LOGDIR/worker$i.log" 2>&1 &
    W_PIDS+=($!)
done
sleep 8

cleanup() {
    kill "${W_PIDS[@]}" "$MASTER_PID" 2>/dev/null
    wait "${W_PIDS[@]}" "$MASTER_PID" 2>/dev/null
}
trap cleanup EXIT

python "$REPO/tools/standalone_smoke.py" \
    --master spark://127.0.0.1:7077 \
    --executor-cores "$CORES" --executor-mem "$MEM" "$@"
RC=$?
echo "logs in $LOGDIR" >&2
exit $RC
