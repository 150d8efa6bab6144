#!/bin/bash
# Video → COLMAP sparse reconstruction driver.
# Equivalent of the reference's process_video.sh: ffmpeg frame extraction
# (10 fps, padded square 1024), COLMAP feature extraction / exhaustive
# matching / mapping, TXT export. Follow with:
#   python -m burn_raymarching_tpu.tools.colmap_to_json
#   python -m burn_raymarching_tpu.tools.process_cameras
set -e

VIDEO_FILE="${1:-data/tomato.mp4}"
BASE_DIR="${2:-data/tomato}"
IMG_DIR="$BASE_DIR/images"
DB_PATH="$BASE_DIR/database.db"
SPARSE_DIR="$BASE_DIR/sparse/"

echo "🧹 1. Cleaning previous data..."
rm -rf "$BASE_DIR"
mkdir -p "$IMG_DIR" "$SPARSE_DIR"

echo "🎞️ 2. Extracting frames (10 fps, 1024x1024 padded square)..."
ffmpeg -i "$VIDEO_FILE" \
  -vf "fps=10,scale=1024:1024:force_original_aspect_ratio=decrease,pad=1024:1024:(ow-iw)/2:(oh-ih)/2:black" \
  -q:v 2 "$IMG_DIR/img_%04d.jpg"

echo "🔍 3. COLMAP feature extraction..."
colmap feature_extractor \
  --database_path "$DB_PATH" \
  --image_path "$IMG_DIR" \
  --ImageReader.single_camera 1 \
  --ImageReader.camera_model SIMPLE_PINHOLE \
  --FeatureExtraction.use_gpu 0

echo "🤝 4. COLMAP exhaustive matching..."
colmap exhaustive_matcher \
  --database_path "$DB_PATH" \
  --FeatureMatching.use_gpu 0

echo "🗺️ 5. COLMAP mapping..."
colmap mapper \
  --database_path "$DB_PATH" \
  --image_path "$IMG_DIR" \
  --output_path "$SPARSE_DIR" \
  --Mapper.min_num_matches 10 \
  --Mapper.init_min_num_inliers 30

echo "📄 6. Converting to TXT..."
colmap model_converter \
  --input_path "$SPARSE_DIR/0" \
  --output_path "$SPARSE_DIR/0" \
  --output_type TXT

echo "🎉 Done. cameras.txt and images.txt are in $SPARSE_DIR/0"
