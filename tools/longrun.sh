#!/bin/bash
# Full reference training recipe on the fixture corpus (quality-parity
# evidence run): train_v -> pretrain_g -> adversarial train -> eval.
# Mirrors the reference workflow README.md:101-127 (V first, optional G
# pretrain, then train.lua picks both up by filename).
set -x
DIR=${1:-runs/longrun}
EPOCHS=${2:-400}
cd "$(dirname "$0")/.."
mkdir -p "$DIR"
python -m catgen.cli.train_v    --fixture "${FIXTURE:-256}" --epochs 30 --save "$DIR" || exit 1
python -m catgen.cli.pretrain_g --fixture "${FIXTURE:-256}" --epochs 10 --save "$DIR" || exit 1
python -m catgen.cli.train      --fixture "${FIXTURE:-256}" --epochs "$EPOCHS" --saveFreq 30 \
    --visFreq "${VISFREQ:-10}" --augment --save "$DIR" || exit 1
python -m catgen.cli.eval_quality --save "$DIR" || exit 1
echo LONGRUN_DONE
