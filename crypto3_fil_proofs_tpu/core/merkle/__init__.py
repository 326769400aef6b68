from .storage import (  # noqa: F401
    NODE_SIZE,
    DiskStore,
    ExternalReader,
    LevelCacheStore,
    ReplicaConfig,
    Store,
    StoreConfig,
    VecStore,
    get_merkle_proof_lemma_len,
    get_merkle_tree_cache_size,
    get_merkle_tree_leafs,
    get_merkle_tree_len,
    get_merkle_tree_row_count,
)
from .tree import CompoundMerkleTree, MerkleProof, MerkleTree, ProofLevel  # noqa: F401
from .builders import (  # noqa: F401
    compact,
    create_base_merkle_tree,
    create_lc_tree,
    create_tree,
    get_base_tree_count,
    split_config,
    split_config_and_replica,
)
