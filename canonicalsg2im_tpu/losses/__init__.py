from canonicalsg2im_tpu.losses.bbox import bbox_losses, mask_pred_loss
from canonicalsg2im_tpu.losses.gan import (
    GanLoss,
    bce_logits,
    gan_d_loss,
    gan_g_loss,
    get_gan_losses,
)
