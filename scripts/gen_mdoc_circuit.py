#!/usr/bin/env python
"""Our circuit_maker twin (lib/circuits/mdoc/circuit_maker.cc): compile
the mdoc circuit pair with api.generate_circuit and write the compressed
twin-circuit file + its circuit id to artifacts/.

  python scripts/gen_mdoc_circuit.py [num_attributes]
"""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from longfellow_zk_tpu.circuits.mdoc import api
from longfellow_zk_tpu.circuits.mdoc.zk_spec import find_zk_spec_by_version


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    spec = find_zk_spec_by_version(7, n)
    t0 = time.time()
    data = api.generate_circuit(spec)
    cid = api.circuit_id(data)
    out = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "mdoc_v7_%dattr.zst" % n)
    with open(out, "wb") as f:
        f.write(data)
    print("wrote %s: %d bytes, circuit id %s, %.1fs"
          % (out, len(data), cid, time.time() - t0))


if __name__ == "__main__":
    main()
