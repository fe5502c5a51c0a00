from .small import (  # noqa: F401
    K_DATE_LEN, OpenedAttribute, PtrCred, Small, SmallWitness)
