#!/bin/bash
# Five-stage RefineNet pipeline on the learnable synthetic OpenEDS set,
# producing a *score curve* (periodic val eds score vs step) per system —
# the quality-trajectory evidence for BASELINE.md (reference metric:
# models/networks/loss.py:158-174; pipeline: refinenet/README.md).
#
#   STEPS=400 TEST_EVERY=50 bash tools/run_refinenet_curve.sh
#
# Outputs: runs/segnet_curve.jsonl, runs/refinenet_curve.jsonl
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}
DATA=runs/refinenet_data.h5
STEPS=${STEPS:-400}
TEST_EVERY=${TEST_EVERY:-50}
BS=${BS:-8}
mkdir -p runs

python - "$DATA" <<'EOF'
import sys, os
sys.path.insert(0, ".")
from seg2eye_tpu.data import schema
if not os.path.exists(sys.argv[1]):
    schema.write_synthetic_h5(sys.argv[1],
                              users=("U001", "U002", "U003", "U004"),
                              n_ss=24, n_gen=8, n_seq=4, seed=0,
                              learnable=True)
    print("fixture written:", sys.argv[1])
EOF

echo "=== stage 1: train segnet ==="
SEGNET_OUT=$(python refinenet/train_segnet.py --dataroot "$DATA" \
    --batch_size "$BS" --test_batch_size 16 --test_num_samples 64 \
    --max_steps "$STEPS" --test_every_n_steps "$TEST_EVERY" \
    | tee /dev/stderr | awk '/^output_dir:/{print $2}')
cp "$SEGNET_OUT/gsheet_rows.jsonl" runs/segnet_curve.jsonl

echo "=== stage 2: predicted masks (generative + sequence) ==="
python refinenet/evaluate_segnet.py --resume_from "$SEGNET_OUT" \
    --dataroot "$DATA" --output runs/segs_gen.h5
python refinenet/evaluate_segnet.py --resume_from "$SEGNET_OUT" \
    --dataroot "$DATA" --image_key images_seq --output runs/segs_seq.h5

echo "=== stage 3: NN style ranking ==="
python tools/build_style_ranking.py --dataroot "$DATA" \
    --segmentations_generative runs/segs_gen.h5 \
    --segmentations_sequence runs/segs_seq.h5 --out runs/ranking.h5

echo "=== stage 4: train refinenet ==="
REFINE_OUT=$(python refinenet/train_refinenet.py --dataroot "$DATA" \
    --distances_and_indices runs/ranking.h5 \
    --segmentations_train runs/segs_gen.h5 \
    --segmentations_generative runs/segs_gen.h5 \
    --segmentations_sequence runs/segs_seq.h5 \
    --batch_size "$BS" --test_batch_size 16 --test_num_samples 64 \
    --max_steps "$STEPS" --test_every_n_steps "$TEST_EVERY" \
    | tee /dev/stderr | awk '/^output_dir:/{print $2}')
cp "$REFINE_OUT/gsheet_rows.jsonl" runs/refinenet_curve.jsonl

echo "=== stage 5: submission npys ==="
python refinenet/evaluate_refinenet.py --resume_from "$REFINE_OUT" \
    --dataroot "$DATA" --distances_and_indices runs/ranking.h5 \
    --segmentations_train runs/segs_gen.h5 \
    --segmentations_generative runs/segs_gen.h5 \
    --segmentations_sequence runs/segs_seq.h5

echo "curves: runs/segnet_curve.jsonl runs/refinenet_curve.jsonl"
