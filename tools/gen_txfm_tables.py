#!/usr/bin/env python3
"""Extract AV1 transform butterfly stage tables as data.

The AV1 spec normatively fixes the integer transform networks (inverse DCT /
ADST butterflies with cos/sin rotation constants, stage counts, and rounding
points — spec sec 7.13.2). This tool reads the reference's scalar kernels
(Source/Lib/Codec/{transforms.c,inv_transforms.c}, e.g. svt_av1_idct4_new at
inv_transforms.c:94) and converts each butterfly network into a numeric stage
table consumed by our batched TPU stage-interpreter (ops/transforms.py).

Encoding per stage, per output lane n:
    mode[n] == 0:  out[n] = ka*x[ia] + kb*x[ib]            (ka, kb in {-1,0,1})
    mode[n] == 1:  out[n] = round_shift(ca*x[ia] + cb*x[ib], cos_bit)
                   with ca = sign(ka)*cospi[|ka|-1], cb likewise from kb.
Stored as int32 arrays of shape (n_stages, 5, N): rows = ia, ka, ib, kb, mode.
The runtime validates every table numerically against the ideal float
DCT/ADST basis (tests/test_transforms.py), so these are checked math tables,
not trusted code.
"""
from __future__ import annotations

import os
import re
import sys

import numpy as np

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "svtav1_tpu", "constants", "data")

FUNCS = {
    # name in npz: (file, c function name)
    "idct4": ("inv_transforms.c", "svt_av1_idct4_new"),
    "idct8": ("inv_transforms.c", "svt_av1_idct8_new"),
    "idct16": ("inv_transforms.c", "svt_av1_idct16_new"),
    "idct32": ("inv_transforms.c", "svt_av1_idct32_new"),
    "idct64": ("inv_transforms.c", "svt_av1_idct64_new"),
    "iadst8": ("inv_transforms.c", "svt_av1_iadst8_new"),
    "iadst16": ("inv_transforms.c", "svt_av1_iadst16_new"),
    "fdct4": ("transforms.c", "svt_av1_fdct4_new"),
    "fdct8": ("transforms.c", "svt_av1_fdct8_new"),
    "fdct16": ("transforms.c", "svt_av1_fdct16_new"),
    "fdct32": ("transforms.c", "svt_av1_fdct32_new"),
    "fdct64": ("transforms.c", "svt_av1_fdct64_new"),
    "fadst8": ("transforms.c", "svt_av1_fadst8_new"),
    "fadst16": ("transforms.c", "svt_av1_fadst16_new"),
}

ASSIGN_RE = re.compile(r"bf1\[(\d+)\]\s*=\s*(.*?);")
HALF_BTF_RE = re.compile(
    r"half_btf\(\s*(-?)cospi\[(\d+)\]\s*,\s*(?:input|bf0)\[(\d+)\]\s*,\s*(-?)cospi\[(\d+)\]\s*,\s*(?:input|bf0)\[(\d+)\]\s*,\s*cos_bit\s*\)"
)
CLAMP_RE = re.compile(r"clamp_value\(\s*(.*?)\s*,\s*stage_range\[stage\]\s*\)")
PAIR_RE = re.compile(r"(-?)\s*(?:input|bf0)\[(\d+)\]\s*(?:([+-])\s*(?:input|bf0)\[(\d+)\])?\s*$")
INPUT_RE = re.compile(r"(-?)\s*(?:input|bf0)\[(\d+)\]\s*$")


def extract_fn(text: str, cname: str) -> np.ndarray:
    m = re.search(rf"void {re.escape(cname)}\(.*?\)\s*\{{", text)
    assert m, cname
    # function body: to the matching closing brace at column 0
    end = text.index("\n}", m.end())
    body = text[m.end() : end]
    # split into stages on "// stage" markers; stage 0 is empty
    chunks = re.split(r"//\s*stage\s*\d*", body)[1:]
    stages = []
    for chunk in chunks:
        lanes = {}
        for am in ASSIGN_RE.finditer(chunk):
            lane = int(am.group(1))
            rhs = am.group(2).strip()
            hb = HALF_BTF_RE.match(rhs)
            if hb:
                sa, ca, ia, sb, cb, ib = hb.groups()
                ka = (ca and int(ca) + 1) * (-1 if sa == "-" else 1)
                kb = (cb and int(cb) + 1) * (-1 if sb == "-" else 1)
                lanes[lane] = (int(ia), ka, int(ib), kb, 1)
                continue
            cl = CLAMP_RE.match(rhs)
            if cl:
                rhs = cl.group(1)
            pm = PAIR_RE.match(rhs)
            if pm:
                sa, ia, op, ib = pm.groups()
                ka = -1 if sa == "-" else 1
                if ib is None:
                    lanes[lane] = (int(ia), ka, 0, 0, 0)
                else:
                    kb = -1 if op == "-" else 1
                    lanes[lane] = (int(ia), ka, int(ib), kb, 0)
                continue
            im = INPUT_RE.match(rhs)
            if im:
                sa, ia = im.groups()
                lanes[lane] = (int(ia), -1 if sa == "-" else 1, 0, 0, 0)
                continue
            raise ValueError(f"{cname}: unparsed rhs: {rhs!r}")
        if not lanes:
            continue
        n = max(lanes) + 1
        assert sorted(lanes) == list(range(n)), (cname, sorted(lanes))
        st = np.zeros((5, n), np.int32)
        for lane, (ia, ka, ib, kb, mode) in lanes.items():
            st[:, lane] = (ia, ka, ib, kb, mode)
        stages.append(st)
    arr = np.stack(stages)  # (S, 5, N)
    return arr


def main() -> None:
    texts = {}
    out = {}
    for name, (fname, cname) in FUNCS.items():
        if fname not in texts:
            with open(os.path.join(REF, "Source", "Lib", "Codec", fname), errors="replace") as f:
                texts[fname] = re.sub(r"/\*.*?\*/", " ", f.read(), flags=re.S)
        out[name] = extract_fn(texts[fname], cname)
        print(f"{name}: {out[name].shape[0]} stages x {out[name].shape[2]} lanes")
    np.savez_compressed(os.path.join(OUT, "txfm_stages.npz"), **out)


if __name__ == "__main__":
    main()
