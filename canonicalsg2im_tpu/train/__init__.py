from canonicalsg2im_tpu.train.state import LayoutTrainState, create_layout_state
from canonicalsg2im_tpu.train.step import (layout_train_step,
    layout_train_multi_step, layout_eval_step)
