#!/bin/bash
# Continuation of run_scaling_r5.sh after the session crash killed it
# mid-pairing-3: re-runs pairings 3+4 and the post-run bandwidth probe
# on the SAME corpus (/root/scale_corpus_r5, kept from pairing 1).
set -u
cd /root/repo
OUT=scaling_r5_raw
CORPUS=/root/scale_corpus_r5
export SCALE_ENTITIES=240000 SCALE_HOT_FAMILY=2000
log() { echo "[$(date +%H:%M:%S)] $*" >> "$OUT/driver.log"; }
log "RESTART: pairing 3: unpinned 2->8 (+machine ceiling)"
python scripts/scaling_bench.py --keep-input "$CORPUS" --levels 2 8 --ceiling \
  > "$OUT/unpinned_2_8.jsonl" 2> "$OUT/unpinned_2_8.err"
log "pairing 4: pinned 2->8"
python scripts/scaling_bench.py --keep-input "$CORPUS" --levels 2 8 --pin \
  > "$OUT/pinned_2_8.jsonl" 2> "$OUT/pinned_2_8.err"
log "bandwidth probe repeat (post-run, detects thermal drift)"
python scripts/bandwidth_probe.py > "$OUT/bandwidth_probe_post.json" 2>> "$OUT/bandwidth_probe.err"
log "done (continuation)"
