from canonicalsg2im_tpu.evaluation.metrics import jaccard, jaccard_masks, masked_batch_iou
