"""Domain-separated seeds (reference: core/crypto/domain_seed.hpp:36-52)."""
import hashlib

DRSAMPLE_DST = b"Filecoin_DRSample"
FEISTEL_DST = b"Filecoin_Feistel"


def derive_porep_domain_seed(dst: bytes, porep_id: bytes) -> bytes:
    """SHA-256(dst || porep_id) -> 32 bytes."""
    assert len(porep_id) == 32
    return hashlib.sha256(dst + porep_id).digest()


def derive_drg_seed(porep_id: bytes) -> bytes:
    """First 28 bytes of the DRSample domain seed
    (reference: core/drgraph.hpp:51-56)."""
    return derive_porep_domain_seed(DRSAMPLE_DST, porep_id)[:28]
