from . import (  # noqa: F401
    bloom,
    cluster,
    exact,
    incremental,
    jaccard,
    minhash,
    portable,
    simhash,
    substring,
)
