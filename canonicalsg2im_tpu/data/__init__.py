from canonicalsg2im_tpu.data.pipeline import (
    Batch,
    SceneGraphSample,
    BucketedLoader,
    pad_batch,
)
from canonicalsg2im_tpu.data.vocab import (
    META_RELATIONS,
    AUGMENTED_RELATIONS,
    build_clevr_vocab,
    register_relations,
)
from canonicalsg2im_tpu.data.dataset_params import get_dataset
