from .bitaddr import BitaddrCircuit, BitaddrWitness  # noqa: F401
