#!/bin/bash
# Gate-window hunter: probe the host's 4->16 scaling ceiling every
# POLL seconds; the moment a probe reads >= 0.9 (the BASELINE.md
# quiet-window bar), launch the official 4->16 scaling pair and exit.
# Writes probes to gate_probes.log and the pair result to
# scale_r5_gate.json. Refuses to launch while another scaling_bench
# is running.
cd /root/repo || exit 1
POLL=${POLL:-420}
while true; do
  if pgrep -f "tools/scaling_bench.py" >/dev/null; then
    sleep "$POLL"; continue
  fi
  p=$(python tools/host_probe.py 4 2>/dev/null | tail -1)
  echo "$(date -u +%H:%M:%S) $p" >> gate_probes.log
  eff=$(echo "$p" | python -c "import json,sys; print(json.load(sys.stdin)['host_ceiling_efficiency'])" 2>/dev/null)
  ok=$(python -c "print(1 if float('${eff:-0}') >= 0.9 else 0)")
  if [ "$ok" = "1" ]; then
    echo "$(date -u +%H:%M:%S) QUALIFYING WINDOW ($eff) - launching official pair" >> gate_probes.log
    SPARK_SCALE_PIN=1 python tools/scaling_bench.py /root/testdata/sf0.1 4 96 \
      2>scale_r5_gate.err > scale_r5_gate.json
    echo "$(date -u +%H:%M:%S) pair done" >> gate_probes.log
    exit 0
  fi
  sleep "$POLL"
done
