from .reference import (  # noqa: F401
    KL, KR, RIPEMD_INIT, RL, RR, SL, SR, ripemd160, ripemd160_pad,
    transform_block)
from .circuit import Ripemd160Circuit  # noqa: F401
from .witness import compute_witness, fill_witness, message_wires  # noqa: F401
