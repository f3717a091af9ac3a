#!/usr/bin/env python3
"""Extract normative AV1 constant tables from the reference tree as .npz data.

The AV1 specification fixes these tables bit-for-bit (default CDF initializers,
quantizer step lookup tables, coefficient scan orders). Every conformant AV1
codebase carries identical values; we extract them once from the reference at
/root/reference (SVT-AV1 v2.2.0: Source/Lib/Codec/cabac_context_model.c,
inv_transforms.c:3263-3366, coefficients.h:86+) into numpy archives that the
TPU encoder loads as plain data. No code is copied — only spec constants.

Usage: python tools/extract_normative.py [--ref /root/reference] [--out svtav1_tpu/constants/data]
"""
from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

AOM_CDF_RE = re.compile(r"AOM_CDF(\d+)\s*\(")
AOM_ICDF_RE = re.compile(r"AOM_ICDF\s*\(")
_EXPR_OK = re.compile(r"^[0-9xXa-fA-F+\-*/()<> \t]+$")


def _cint(tok: str) -> int:
    """Evaluate a constant integer C expression (numbers and arithmetic only)."""
    tok = tok.strip()
    if not tok or not _EXPR_OK.match(tok):
        raise ValueError(tok)
    return int(eval(tok, {"__builtins__": {}}, {}))


def _strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def _expand_cdf_macros(text: str) -> str:
    """Expand AOM_CDFn(a, b, ...) -> '32768-a, ..., 0, 0' (ICDF form + counter)
    and AOM_ICDF(x) -> 32768-x, matching the in-memory layout the range coder
    consumes (probabilities stored as 32768 - cdf, trailing adaptation counter).
    """

    def expand_cdfn(m: re.Match) -> str:
        n = int(m.group(1))
        start = m.end()
        depth = 1
        i = start
        while depth:
            c = text[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        args = [a.strip() for a in text[start : i - 1].split(",")]
        assert len(args) == n - 1, (n, args)
        vals = [str(32768 - _cint(a)) for a in args] + ["0", "0"]
        return ", ".join(vals) + text[i:]

    while True:
        m = AOM_CDF_RE.search(text)
        if not m:
            break
        text = text[: m.start()] + expand_cdfn(m)
    while True:
        m = AOM_ICDF_RE.search(text)
        if not m:
            break
        start = m.end()
        i = text.index(")", start)
        v = 32768 - _cint(text[start:i])
        text = text[: m.start()] + str(v) + text[i + 1 :]
    return text


def _parse_braces(text: str, pos: int):
    """Parse a C brace initializer starting at text[pos] == '{' into nested lists."""
    assert text[pos] == "{"
    pos += 1
    items = []
    buf = []

    def flush():
        s = "".join(buf).strip().rstrip(",").strip()
        buf.clear()
        if not s:
            return
        for tok in s.split(","):
            tok = tok.strip()
            if tok:
                items.append(_cint(tok) if not tok.lstrip("-").startswith("0x") else int(tok, 0))

    while True:
        c = text[pos]
        if c == "{":
            flush()
            sub, pos = _parse_braces(text, pos)
            items.append(sub)
        elif c == "}":
            flush()
            return items, pos + 1
        else:
            buf.append(c)
            pos += 1


def _shape_of(nested) -> list:
    """Max shape over a ragged nested list (C zero-fills short initializers)."""
    if not isinstance(nested, list):
        return []
    sub = [_shape_of(x) for x in nested]
    depth = max((len(s) for s in sub), default=0)
    dims = [len(nested)]
    for d in range(depth):
        dims.append(max((s[d] if d < len(s) else 0) for s in sub))
    return dims


def _fill(arr: np.ndarray, nested, idx=()) -> None:
    if not isinstance(nested, list):
        arr[idx] = nested
        return
    for i, x in enumerate(nested):
        _fill(arr, x, idx + (i,))


def _to_array(nested, dtype=np.int32) -> np.ndarray:
    try:
        return np.array(nested, dtype=dtype)
    except ValueError:
        shape = _shape_of(nested)
        arr = np.zeros(shape, dtype=dtype)
        _fill(arr, nested)
        return arr


def extract_tables(path: str, name_filter=None) -> dict:
    with open(path, "r", errors="replace") as f:
        text = _strip_comments(f.read())
    text = _expand_cdf_macros(text)
    out = {}
    # declarations: <qualifiers> <type> <name>[dims] = { ... };
    for m in re.finditer(r"(\w+)\s*(?:\[[^\]]*\]\s*)+\)?\s*=\s*\{", text):
        name = m.group(1)
        if name_filter and not name_filter(name):
            continue
        brace_pos = text.index("{", m.end() - 1)
        try:
            nested, _ = _parse_braces(text, brace_pos)
            arr = _to_array(nested)
        except (ValueError, AssertionError, IndexError):
            continue  # non-numeric initializer (e.g. pointer tables)
        out[name] = arr
    return out


def extract_nmv_context(path: str) -> dict:
    """Parse the default_nmv_context struct initializer (AV1 spec default MV
    CDFs) into per-field arrays. Struct layout (NmvContext): joints_cdf, then
    per component [v, h]: classes, class0_fp[2], fp, sign, class0_hp, hp,
    class0, bits[10]."""
    with open(path, "r", errors="replace") as f:
        text = _strip_comments(f.read())
    text = _expand_cdf_macros(text)
    m = re.search(r"default_nmv_context\s*=\s*\{", text)
    assert m, "default_nmv_context not found"
    nested, _ = _parse_braces(text, text.index("{", m.end() - 1))
    joints, comps = nested
    out = {"default_nmv_joints": np.array(joints, np.int32)}
    fields = ["classes", "class0_fp", "fp", "sign", "class0_hp", "hp", "class0", "bits"]
    per = {f: [] for f in fields}
    for comp in comps:
        assert len(comp) == len(fields), len(comp)
        for f, v in zip(fields, comp):
            per[f].append(v)
    for f in fields:
        out[f"default_nmv_{f}"] = _to_array(per[f])
    return out


def extract_scan_orders(path: str) -> dict:
    """Parse av1_scan_orders[TX_SIZES_ALL][TX_TYPES] = {{ {scan, iscan, nb}, ...}}
    into an index map over the named scan tables."""
    with open(path, "r", errors="replace") as f:
        text = _strip_comments(f.read())
    m = re.search(r"av1_scan_orders\s*\[[^=]*=\s*\{", text)
    assert m, "av1_scan_orders not found"
    pos = text.index("{", m.end() - 1)
    depth = 0
    i = pos
    while True:
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                break
        i += 1
    body = text[pos : i + 1]
    rows = re.findall(r"\{\s*(\w+)\s*,\s*(\w+)\s*,\s*(\w+)\s*\}", body)
    return {"rows": rows}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "svtav1_tpu", "constants", "data"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    codec = os.path.join(args.ref, "Source", "Lib", "Codec")

    # 1. Default CDF tables (AV1 spec ss. "Default CDF tables").
    cdfs = extract_tables(os.path.join(codec, "cabac_context_model.c"))
    cdfs.update(extract_nmv_context(os.path.join(codec, "cabac_context_model.c")))
    np.savez_compressed(os.path.join(args.out, "default_cdfs.npz"), **{k: v.astype(np.int32) for k, v in cdfs.items()})
    print(f"default_cdfs.npz: {len(cdfs)} tables")

    # 2. Quantizer lookup tables (AV1 spec s. 7.12.2 dc_q/ac_q).
    quant = extract_tables(
        os.path.join(codec, "inv_transforms.c"),
        name_filter=lambda n: "qlookup" in n,
    )
    assert len(quant) == 6, sorted(quant)
    np.savez_compressed(os.path.join(args.out, "qlookup.npz"), **{k: v.astype(np.int32) for k, v in quant.items()})
    print(f"qlookup.npz: {sorted(quant)}")

    # 3. Scan orders (AV1 spec s. 5.11.41 et al).
    scans = extract_tables(
        os.path.join(codec, "coefficients.h"),
        name_filter=lambda n: re.match(r"^(default_scan|mrow_scan|mcol_scan|av1_default_iscan|av1_mrow_iscan|av1_mcol_iscan)_", n)
        and not n.endswith("_neighbors"),
    )
    # 3b. Filter-intra taps (AV1 spec 7.11.2.3 Intra_Filter_Taps).
    fi = extract_tables(
        os.path.join(args.ref, "Source", "Lib", "C_DEFAULT", "filterintra_c.c"),
        name_filter=lambda n: "filter_intra_taps" in n,
    )
    assert len(fi) == 1, sorted(fi)
    np.savez_compressed(os.path.join(args.out, "filter_intra.npz"),
                        taps=list(fi.values())[0].astype(np.int32))
    print("filter_intra.npz: taps", list(fi.values())[0].shape)

    order = extract_scan_orders(os.path.join(codec, "coefficients.h"))
    scan_names = np.array([[r[0], r[1]] for r in order["rows"]])
    np.savez_compressed(os.path.join(args.out, "scans.npz"), __order_names__=scan_names,
                        **{k: v.astype(np.int32) for k, v in scans.items()})
    print(f"scans.npz: {len(scans)} tables, order rows={len(order['rows'])}")

    # 4. Film grain gaussian sequence (AV1 spec s. 7.18.3.1 Gaussian_Sequence).
    gs = extract_tables(
        os.path.join(codec, "grainSynthesis.c"),
        name_filter=lambda n: n == "gaussian_sequence",
    )
    assert gs["gaussian_sequence"].shape == (2048,), gs["gaussian_sequence"].shape
    np.savez_compressed(os.path.join(args.out, "gaussian_sequence.npz"),
                        gaussian_sequence=gs["gaussian_sequence"].astype(np.int16))
    print("gaussian_sequence.npz: 2048 entries")


if __name__ == "__main__":
    sys.exit(main())
