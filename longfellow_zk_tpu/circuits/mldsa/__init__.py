from .params import MLDSA_44, MLDSA_65, MLDsaParams, N, Q, zetas  # noqa: F401
from . import reference  # noqa: F401
