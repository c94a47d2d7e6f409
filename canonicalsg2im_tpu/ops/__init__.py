from canonicalsg2im_tpu.ops.layout import (
    box_coverage,
    boxes_to_layout,
    masks_to_layout,
    sample_masks,
)
from canonicalsg2im_tpu.ops.bilinear import crop_bbox, crop_bbox_batch
