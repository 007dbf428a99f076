from catgen.sample.sampler import (  # noqa: F401
    generate_batched,
    interleave_pairs,
    nearest_neighbours,
    neighbours_of_best,
    rank_by_d,
    sample_and_rank,
)
