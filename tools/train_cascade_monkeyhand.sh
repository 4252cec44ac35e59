#!/bin/bash
# Regenerate the committed trained/MonkeyHand cascade with one command:
#
#   bash tools/train_cascade_monkeyhand.sh [WORKDIR]
#
# Trains the full stack on Example_Dataset exactly as the reference's
# `jarvis train all` recipe does (reference train_interface.py:124-213):
# CenterDetect + KeypointDetect finetuned from the MonkeyHand pretrains,
# HybridNet '3D_only' from the trained KeypointDetect — then copies the
# final checkpoints into trained/MonkeyHand/ (the artifacts bench.py and
# the fidelity suite pin against; BASELINE.md "Trained-cascade accuracy").
#
# Every stage is wrapped in a resume loop: the SIGTERM preemption guard
# saves a resumable train state, so repeating `--resume latest` until the
# stage's *final* checkpoint exists always makes progress, and a stage
# can never start from random init because its predecessor was cut short.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-$REPO/work}"
export JARVIS_PARENT_DIR="$WORK"
cd "$REPO"
LOG="$WORK/train_all.log"
mkdir -p "$WORK"

# The project + pretrains must exist in $WORK (created by
# `jarvis create-project` / shipped with the round's work dir).
if [ ! -d "$WORK/projects/MonkeyHand" ]; then
    echo "No $WORK/projects/MonkeyHand project; create it first" >&2
    exit 1
fi

final_exists() {  # $1 = model dir name, $2 = final ckpt glob
    compgen -G "$WORK/projects/MonkeyHand/models/$1/*/$2" > /dev/null
}

run_stage() {  # $1 = model dir, $2 = final glob, $3... = first-run command
    local model="$1" glob="$2"; shift 2
    local tries=0
    if ! final_exists "$model" "$glob"; then
        echo "=== TRAIN $model $(date) ===" >> "$LOG"
        timeout 14400 "$@" >> "$LOG" 2>&1
        echo "${model}_exit=$?" >> "$LOG"
    fi
    while ! final_exists "$model" "$glob" && [ "$tries" -lt 6 ]; do
        echo "=== RESUME $model try=$tries $(date) ===" >> "$LOG"
        timeout 14400 python -u -m jarvis_hybridnet_tpu.ui.cli train \
            "$3_cmd_unused" 2>/dev/null  # placeholder, replaced below
        tries=$((tries + 1))
    done
}

train() { python -u -m jarvis_hybridnet_tpu.ui.cli train "$@"; }

stage() {  # $1 = model dir, $2 = cli network name, $3... = extra first-run args
    local model="$1" net="$2"; shift 2
    local glob tries=0
    case "$model" in
        HybridNet) glob="HybridNet-*_final.ckpt" ;;
        *)         glob="EfficientTrack-*_final.ckpt" ;;
    esac
    if ! final_exists "$model" "$glob"; then
        echo "=== TRAIN $model $(date) ===" >> "$LOG"
        timeout 14400 train "$net" "$@" MonkeyHand >> "$LOG" 2>&1
        echo "${model}_first_exit=$?" >> "$LOG"
    fi
    while ! final_exists "$model" "$glob" && [ "$tries" -lt 6 ]; do
        echo "=== RESUME $model try=$tries $(date) ===" >> "$LOG"
        timeout 14400 train "$net" --resume latest MonkeyHand \
            >> "$LOG" 2>&1
        echo "${model}_resume_exit=$? try=$tries" >> "$LOG"
        tries=$((tries + 1))
        sleep 5
    done
    final_exists "$model" "$glob"
}

stage CenterDetect  centerDetect  --pretrain MonkeyHand  || exit 1
stage KeypointDetect keypointDetect --pretrain MonkeyHand || exit 1
stage HybridNet hybridNet --weights_keypoint_detect latest --mode 3D_only \
    || exit 1

latest_final() {  # newest final ckpt for a model
    ls -t "$WORK"/projects/MonkeyHand/models/"$1"/*/"$2" | head -1
}
mkdir -p "$REPO/trained/MonkeyHand"
cp "$(latest_final CenterDetect 'EfficientTrack-*_final.ckpt')" \
   "$REPO/trained/MonkeyHand/CenterDetect_final.ckpt"
cp "$(latest_final KeypointDetect 'EfficientTrack-*_final.ckpt')" \
   "$REPO/trained/MonkeyHand/KeypointDetect_final.ckpt"
cp "$(latest_final HybridNet 'HybridNet-*_final.ckpt')" \
   "$REPO/trained/MonkeyHand/HybridNet_final.ckpt"
echo "trained/MonkeyHand refreshed:"
ls -la "$REPO/trained/MonkeyHand"
