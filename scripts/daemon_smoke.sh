#!/usr/bin/env bash
# Automated daemon smoke (the `loudmld -c config.yml` user journey,
# /root/reference/loudml/server.py main): boot graft.GraftServer from
# the PACKAGED jar with a config file, drive the 202-job `_read` flow
# over real HTTP — create nothing in-process, poll the job like the
# reference's own `_wait_job` (tests/test_api.py:141-152) — and assert
# the series payload. Produces an artifact on stdout; run as:
#
#   sbt -batch package && bash scripts/daemon_smoke.sh | tee DAEMON_SMOKE_r<N>.txt
#
# Exit 0 = every assertion held.
set -u
PORT="${1:-18099}"
JAR=target/scala-2.13/loudmlspark_2.13-0.1.0.jar
DIR=$(mktemp -d /tmp/graft_daemon.XXXXXX)
trap '[[ -n "${PID:-}" ]] && kill "$PID" 2>/dev/null; rm -rf "$DIR"' EXIT

cat > "$DIR/config.json" <<CFG
{"storage": {"path": "$DIR/store"},
 "server": {"listen": "localhost:$PORT", "workers": 2},
 "buckets": [{"name": "events_sf", "type": "testdata",
              "dir": "/root/testdata/sf0.001", "table": "events"}]}
CFG

echo "== daemon smoke: spark-submit graft.GraftServer (port $PORT) =="
/opt/spark/bin/spark-submit --class graft.GraftServer \
  --master "local[4]" --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.shuffle.partitions=8 \
  "$JAR" "$DIR/config.json" "$PORT" > "$DIR/server.log" 2>&1 &
PID=$!

fail() { echo "FAIL: $1"; echo "--- server.log tail ---"; tail -20 "$DIR/server.log"; exit 1; }

# poll until the facade binds (cold spark-submit ~25 s)
up=""
for i in $(seq 1 60); do
  if curl -sf "http://127.0.0.1:$PORT/" > /dev/null 2>&1; then up=1; break; fi
  kill -0 "$PID" 2>/dev/null || fail "server process exited during boot"
  sleep 2
done
[[ -n "$up" ]] || fail "server did not bind within 120s"
echo "PASS boot: home document served"

BUCKETS=$(curl -s "http://127.0.0.1:$PORT/buckets")
echo "buckets: $BUCKETS"
[[ "$BUCKETS" == *"events_sf"* ]] || fail "config bucket not hydrated"
echo "PASS config: bucket registry hydrated from file"

# 202-job _read; features is the DSL string
JOB=$(curl -s -X POST "http://127.0.0.1:$PORT/buckets/events_sf/_read?bucket_interval=1h&from=2024-01-01T00:00:00.000Z&to=2024-01-01T06:00:00.000Z&features=avg(value)%3Bcount(value)")
echo "submit: $JOB"
JOB_ID=$(echo "$JOB" | tr -d '"')
[[ "$JOB_ID" == job-* ]] || fail "_read did not return a job id"
echo "PASS submit: 202-job contract returned $JOB_ID"

# jobs are ASYNC now: poll through waiting/running to a terminal state
STATE=""
for i in $(seq 1 60); do
  DOC=$(curl -s "http://127.0.0.1:$PORT/jobs/$JOB_ID")
  STATE=$(echo "$DOC" | python3 -c 'import json,sys; print(json.load(sys.stdin)["state"])')
  [[ "$STATE" == "done" || "$STATE" == "failed" ]] && break
  sleep 1
done
[[ "$STATE" == "done" ]] || fail "job ended in state '$STATE': $DOC"
echo "PASS poll: job reached done"

python3 - "$DOC" <<'PY' || fail "series payload shape"
import json, sys
doc = json.loads(sys.argv[1])
res = doc["result"]
ts = res["timestamps"]
assert len(ts) == 6, f"expected 6 hourly buckets, got {len(ts)}"
obs = res["observed"]
assert "avg_value" in obs and "count_value" in obs, list(obs)
assert len(obs["avg_value"]) == 6
print("PASS payload: 6 hourly buckets with avg_value + count_value series")
PY

echo "== daemon smoke: ALL PASS =="
