"""Minimal ONNX graph inspector — protobuf wire-format parser, no deps.

Used to AUDIT the reference's template ONNX graphs
(`/root/reference/src/genie_tts/Data/*/Models/*.onnx`) for exact
operator-level semantics (embedding scaling, mask construction, noise
injection, residual wiring) so the JAX reimplementation and the torch
parity oracle can be checked against ground truth. The `onnx` package is
not installed in this image; these files are plain protobuf, so a ~100
line wire-format reader suffices for structure dumps.

Usage:
  python scripts/onnx_inspect.py <model.onnx> [--ops] [--around NAME]
         [--limit N] [--consts]
"""
from __future__ import annotations

import struct
import sys
from collections import Counter


def _varint(buf, i):
    r, s = 0, 0
    while True:
        b = buf[i]
        r |= (b & 0x7F) << s
        i += 1
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over one protobuf message."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]; i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]; i += ln
        elif wt == 5:
            v = buf[i:i + 4]; i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_attr(buf):
    a = {"name": None, "type": None}
    floats, ints, strings = [], [], []
    for fno, wt, v in fields(buf):
        if fno == 1:
            a["name"] = v.decode()
        elif fno == 2:
            a["f"] = struct.unpack("<f", v)[0]
        elif fno == 3:
            a["i"] = v if isinstance(v, int) else struct.unpack("<q", v)[0]
        elif fno == 4:
            a["s"] = v[:80]
        elif fno == 5:
            a["t"] = parse_tensor(v)
        elif fno == 7:
            floats.append(struct.unpack("<f", v)[0] if wt == 5 else v)
        elif fno == 8:
            ints.append(v)
    if floats:
        a["floats"] = floats
    if ints:
        a["ints"] = ints
    return a


def parse_tensor(buf, want_data=True):
    t = {"dims": [], "data_type": None, "name": None}
    raw = bytearray()
    float_data = []
    int_data = []
    for fno, wt, v in fields(buf):
        if fno == 1:
            if wt == 2:  # packed
                i = 0
                while i < len(v):
                    d, i = _varint(v, i)
                    t["dims"].append(d)
            else:
                t["dims"].append(v)
        elif fno == 2:
            t["data_type"] = v
        elif fno == 8:
            t["name"] = v.decode()
        elif fno == 9:
            raw += v
        elif fno == 4 and wt == 5:
            float_data.append(struct.unpack("<f", v)[0])
        elif fno == 4 and wt == 2:
            for j in range(0, len(v), 4):
                float_data.append(struct.unpack("<f", v[j:j + 4])[0])
        elif fno == 7:
            if wt == 2:
                i = 0
                while i < len(v):
                    d, i = _varint(v, i)
                    int_data.append(d)
            else:
                int_data.append(v)
        elif fno == 13:  # external_data (StringStringEntryProto)
            kv = dict()
            for f2, w2, v2 in fields(v):
                kv[f2] = v2
            t.setdefault("external", []).append(
                (kv.get(1, b"").decode(), kv.get(2, b"")[:80].decode(errors="replace")))
    if want_data:
        import numpy as np
        DT = {1: np.float32, 6: np.int32, 7: np.int64, 9: np.bool_,
              10: np.float16, 11: np.float64}
        if raw and t["data_type"] in DT:
            arr = np.frombuffer(bytes(raw), DT[t["data_type"]])
            t["value"] = arr.reshape(t["dims"]) if t["dims"] else arr
        elif float_data:
            t["value"] = np.asarray(float_data, np.float32).reshape(t["dims"] or (-1,))
        elif int_data:
            t["value"] = np.asarray(int_data, np.int64).reshape(t["dims"] or (-1,))
    return t


def parse_node(buf):
    n = {"inputs": [], "outputs": [], "name": "", "op": "", "attrs": []}
    for fno, wt, v in fields(buf):
        if fno == 1:
            n["inputs"].append(v.decode())
        elif fno == 2:
            n["outputs"].append(v.decode())
        elif fno == 3:
            n["name"] = v.decode()
        elif fno == 4:
            n["op"] = v.decode()
        elif fno == 5:
            n["attrs"].append(parse_attr(v))
    return n


def parse_graph(buf, with_init_data=False):
    g = {"nodes": [], "initializers": {}, "inputs": [], "outputs": [], "name": ""}
    for fno, wt, v in fields(buf):
        if fno == 1:
            g["nodes"].append(parse_node(v))
        elif fno == 2:
            g["name"] = v.decode()
        elif fno == 5:
            t = parse_tensor(v, want_data=with_init_data)
            g["initializers"][t["name"]] = t
        elif fno == 11:
            g["inputs"].append(_vi_name(v))
        elif fno == 12:
            g["outputs"].append(_vi_name(v))
    return g


def _vi_name(buf):
    for fno, wt, v in fields(buf):
        if fno == 1:
            return v.decode()
    return "?"


def load_graph(path, with_init_data=False):
    buf = open(path, "rb").read()
    for fno, wt, v in fields(buf):
        if fno == 7:  # ModelProto.graph
            return parse_graph(v, with_init_data)
    raise ValueError("no graph found")


def fmt_attr(a):
    for k in ("f", "i", "s", "floats", "ints"):
        if k in a:
            return f"{a['name']}={a[k]}"
    if "t" in a:
        t = a["t"]
        val = t.get("value")
        s = f"tensor{t['dims']}"
        if val is not None and val.size <= 8:
            s += f"={val.tolist()}"
        return f"{a['name']}={s}"
    return a["name"]


def main():
    path = sys.argv[1]
    args = sys.argv[2:]
    g = load_graph(path, with_init_data="--consts" in args)
    print(f"graph {g['name']}: {len(g['nodes'])} nodes, "
          f"{len(g['initializers'])} initializers")
    print("inputs:", g["inputs"])
    print("outputs:", g["outputs"])
    if "--ops" in args:
        for op, c in Counter(n["op"] for n in g["nodes"]).most_common():
            print(f"  {op:24s} {c}")
    if "--around" in args:
        key = args[args.index("--around") + 1]
        limit = int(args[args.index("--limit") + 1]) if "--limit" in args else 40
        shown = 0
        for idx, n in enumerate(g["nodes"]):
            hay = " ".join([n["name"], n["op"]] + n["inputs"] + n["outputs"])
            if key in hay:
                attrs = ", ".join(fmt_attr(a) for a in n["attrs"])
                print(f"[{idx}] {n['op']} {n['name']}\n"
                      f"    in:  {n['inputs']}\n    out: {n['outputs']}"
                      + (f"\n    attr: {attrs}" if attrs else ""))
                shown += 1
                if shown >= limit:
                    break


if __name__ == "__main__":
    main()
