"""Layout -> Image from a results dataframe — counterpart of
`scripts/layout_to_img.py`, which renders images from the (GT or predicted)
boxes recorded in a results CSV. Thin alias over generation_dataframe with
GT boxes as the default source.

  python -m scripts.layout_to_img --checkpoint ... --csv results_coco.csv
"""
from __future__ import annotations

import argparse

from scripts.generation_dataframe import main

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--csv", required=True)
    ap.add_argument("--use_gt_boxes", type=int, default=1)
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--max_samples", type=int, default=None)
    main(ap.parse_args())
