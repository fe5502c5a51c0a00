from .reference import Sha3Reference, keccak_rc, keccak_rotc  # noqa: F401
from .circuit import Sha3Circuit, sha3_slice_at  # noqa: F401
from .witness import Sha3Witness  # noqa: F401
