#!/usr/bin/env bash
# Download Visual Genome images + scene-graph JSONs (counterpart of the
# reference's scripts/download_vg.sh), then run scripts/preprocess_vg.py.
set -euo pipefail
ROOT="${1:-datasets}/vg"
mkdir -p "$ROOT/images"
cd "$ROOT"
for f in images.zip images2.zip; do
  wget -c "https://cs.stanford.edu/people/rak248/VG_100K_2/$f"
  unzip -qn "$f" -d images/
done
for f in image_data.json.zip objects.json.zip relationships.json.zip \
         attributes.json.zip object_alias.txt relationship_alias.txt; do
  wget -c "https://visualgenome.org/static/data/dataset/$f" || true
  [[ "$f" == *.zip ]] && unzip -qn "$f"
done
echo "VG ready under $ROOT — now run: python -m scripts.preprocess_vg --vg_dir $ROOT"
