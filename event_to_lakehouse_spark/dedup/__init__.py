from . import (  # noqa: F401
    cluster,
    exact,
    incremental,
    jaccard,
    minhash,
    portable,
    simhash,
    substring,
)
