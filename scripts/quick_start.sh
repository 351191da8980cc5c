#!/usr/bin/env bash
# Quick start: fetch pretrained reference checkpoints and synthesize the demo
# transcript (equivalent of the reference scripts/quick_start.sh).
#
# The reference checkpoints load directly — this framework reads the haiku
# pickle formats (duration_latest_ckpt.pickle / acoustic_latest_ckpt.pickle)
# and the torch HiFi-GAN checkpoint via the converter.
set -euo pipefail

CKPT_DIR=${CKPT_DIR:-assets/infore/nat}
HIFI_DIR=${HIFI_DIR:-assets/infore/hifigan}
BASE_URL="https://huggingface.co/ntt123/viettts_infore_16k/resolve/main"

mkdir -p "$CKPT_DIR" "$HIFI_DIR"
for f in duration_latest_ckpt.pickle acoustic_latest_ckpt.pickle; do
  [ -f "$CKPT_DIR/$f" ] || curl -L -o "$CKPT_DIR/$f" "$BASE_URL/$f"
done
[ -f "$HIFI_DIR/g_01140000" ] || curl -L -o "$HIFI_DIR/g_01140000" "$BASE_URL/g_01140000"

python -m viettts_tpu.tools.convert_torch_hifigan \
  --checkpoint-file "$HIFI_DIR/g_01140000" \
  --output-file "$CKPT_DIR/hifigan_latest_ckpt.pickle"

# The lexicon is generated, not shipped: the reference's lexicon is purely
# character-level and our builder reproduces it exactly from any word list
# (tests/test_frontend.py::test_char_fallback_reproduces_reference_lexicon).
python -m viettts_tpu.tools.build_lexicon \
  -i assets/transcript.txt -o assets/infore/lexicon.txt

# Long-form demo over the in-repo transcript (reference quick_start.sh
# reads assets/transcript.txt the same way).
python -m viettts_tpu.synthesizer \
  --text "$(cat assets/transcript.txt)" \
  --output clip.wav --ckpt-dir "$CKPT_DIR" \
  --lexicon-file assets/infore/lexicon.txt --silence-duration 0.2
echo "wrote clip.wav"
