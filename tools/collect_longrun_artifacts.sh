#!/bin/bash
# Collect the committed quality-evidence artifact set from a longrun.sh
# run directory (QUALITY.md layout): epoch-grid trail, sample.lua-style
# sampler artifacts, quality report, V pseudo-validation curve.
#
#   tools/collect_longrun_artifacts.sh runs/longrun750b artifacts/longrun [epochs...]
set -e
RUN=${1:?run dir}
OUT=${2:-artifacts/longrun}
# shift only what was actually passed: `shift 2` with one arg fails
# WITHOUT shifting, which would leave $RUN in $@ and corrupt EPOCHS
shift $(( $# > 2 ? 2 : $# ))
EPOCHS=${@:-"1 10 50 100 150 200 300 400 500 600 700 750"}
cd "$(dirname "$0")/.."
mkdir -p "$OUT/epochs" "$OUT/samples"
for e in $EPOCHS; do
    f=$(printf "%s/images/epoch_%06d.png" "$RUN" "$e")
    [ -f "$f" ] && cp "$f" "$OUT/epochs/"
done
# sampler artifacts from the final checkpoint (sample.lua:78-151 set)
python -m catgen.cli.sample --save "$RUN" --runs 1 --neighbours
cp "$RUN"/samples/run0_best64.png "$RUN"/samples/run0_worst64.png \
   "$RUN"/samples/run0_real64.png "$RUN"/samples/run0_neighbours.png \
   "$OUT/samples/" 2>/dev/null || cp "$RUN"/run0_*.png "$OUT/samples/" 2>/dev/null || true
# BASELINE statistics report
python -m catgen.cli.eval_quality --save "$RUN" --out "$OUT/quality_report.json"
# final checkpoint, optimizer-stripped (loads via --rebuildOptstate)
python tools/slim_ckpt.py "$RUN/adversarial.ckpt" "$OUT/adversarial_slim.ckpt"
# V pseudo-validation curve from the training metrics
python - "$RUN" "$OUT" <<'EOF'
import json, sys
run, out = sys.argv[1], sys.argv[2]
by_epoch = {}
for line in open(f"{run}/train_metrics.jsonl"):
    r = json.loads(line)
    if r.get("event") == "viz":
        by_epoch[r["epoch"]] = {k: r[k] for k in
                                ("epoch", "v_rating_all", "d_probe_pattern",
                                 "d_probe_real") if k in r}
pts = [by_epoch[e] for e in sorted(by_epoch)]   # dedup resumed runs
json.dump(pts, open(f"{out}/v_curve.json", "w"), indent=1)
print(f"[collect] {len(pts)} v-curve points -> {out}/v_curve.json")
EOF
echo COLLECT_DONE
