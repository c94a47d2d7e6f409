#!/usr/bin/env bash
# Download COCO 2017 images + instances/stuff annotations into the layout
# expected by the data loaders (counterpart of the reference's
# scripts/download_coco.sh).
set -euo pipefail
ROOT="${1:-datasets}/MSCoco"
mkdir -p "$ROOT/images" "$ROOT/annotations"
cd "$ROOT"
for f in train2017.zip val2017.zip; do
  wget -c "http://images.cocodataset.org/zips/$f"
  unzip -qn "$f" -d images/
done
wget -c http://images.cocodataset.org/annotations/annotations_trainval2017.zip
unzip -qn annotations_trainval2017.zip
wget -c http://images.cocodataset.org/annotations/stuff_annotations_trainval2017.zip
unzip -qn stuff_annotations_trainval2017.zip
echo "COCO ready under $ROOT"
