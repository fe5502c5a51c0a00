#!/usr/bin/env python
"""Extract the real-wallet mdoc test examples from the reference's
mdoc_examples.h into a JSON artifact (interop test fixtures, like the
spec test vectors)."""

import json
import os
import re
import sys

SRC = "/root/reference/lib/circuits/mdoc/mdoc_examples.h"
OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "mdoc_examples.json")


def main():
    text = open(SRC).read()
    start = text.index("static const struct MdocTests mdoc_tests[] = {")
    body = text[start:]
    # each example: {StaticString("0x..."), StaticString("0x..."), {bytes},
    #                size, (uint8_t*)"now", docType, size, {bytes}},
    examples = []
    # split on top-level example starts
    chunks = re.split(r"\n\s*//\s*\d+ ", body)
    for chunk in chunks[1:]:
        strs = re.findall(r'StaticString\(\s*((?:"[0-9a-fx]+"\s*)+)\)', chunk)
        if len(strs) < 2:
            continue
        def destr(s):
            return "".join(re.findall(r'"([^"]*)"', s))
        pkx, pky = destr(strs[0]), destr(strs[1])
        arrays = re.findall(r"\{((?:\s*0x[0-9a-fA-F]{2},?)+)\s*\}", chunk)
        if len(arrays) < 2:
            continue
        def debytes(a):
            return [int(x, 16) for x in re.findall(r"0x([0-9a-fA-F]{2})", a)]
        transcript = debytes(arrays[0])
        mdoc = debytes(arrays[-1])
        sizes = re.findall(r"\n\s*(\d+),", chunk)
        now = re.search(r'\(uint8_t\*\)"([^"]+)"', chunk).group(1)
        tr_size = int(sizes[0])
        mdoc_size = int(sizes[1])
        # the C arrays are zero-initialized to their declared size; literals
        # may omit trailing zero bytes
        transcript += [0] * max(0, tr_size - len(transcript))
        mdoc += [0] * max(0, mdoc_size - len(mdoc))
        examples.append(dict(
            pkx=pkx, pky=pky,
            transcript=bytes(transcript[:tr_size]).hex(),
            now=now, doc_type="org.iso.18013.5.1.mDL",
            mdoc=bytes(mdoc[:mdoc_size]).hex()))
        if len(examples) >= 3:
            break
    assert examples, "no examples parsed"
    with open(OUT, "w") as f:
        json.dump(examples, f, indent=1)
    print(f"wrote {len(examples)} examples to {OUT}")
    for e in examples:
        print("pkx:", e["pkx"][:18], "tr:", len(e["transcript"]) // 2,
              "mdoc:", len(e["mdoc"]) // 2, "now:", e["now"])


if __name__ == "__main__":
    main()
