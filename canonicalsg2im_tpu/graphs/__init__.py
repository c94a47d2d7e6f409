from canonicalsg2im_tpu.graphs.closure import (
    ORIGINAL_EDGE,
    TRANSITIVE_EDGE,
    SYMMETRIC_EDGE,
    ANTI_SYMMETRIC_EDGE,
    transitive_closure,
    transitive_reduction,
    minimal_graph,
    triplets_to_adj_matrix,
    matrix_to_triplets,
    triplets_to_minimal,
    reduce_transitive_edges,
    get_maximal_transitive_triplets,
    get_minimal_and_transitive_triplets,
    get_current_and_transitive_triplets,
    get_symmetric_triplets,
)
from canonicalsg2im_tpu.graphs.converse import (
    converse_log_prob,
    converse_prob,
    converse_log_likelihood,
    sample_converse_triplets,
)
