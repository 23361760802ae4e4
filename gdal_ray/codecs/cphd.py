"""CPHD (Compensated Phase History Data) reader — SAR phase-history
container: text KVP header, XML metadata block, PVP (per-vector
parameter) block with a compound record type, and a big-endian signal
block per channel.

Reference: frmts/raw/cphddataset.cpp —
  * header parse (:492-540): lines tokenized on ``[ :=/]`` until the
    form-feed section terminator; CPHD/RELEASE_INFO/CLASSIFICATION map
    to named attributes, unknown keys become lowercased attributes;
  * XML attrs (:545-560): CollectionId.{CollectorName,CoreName,
    CollectType} + RadarMode.ModeType exposed as collector_name /
    core_name / collect_type / radar_mode, plus the whole XML text as
    the ``xml`` attribute;
  * PVP compound type (:56-205): per-node Offset (multiples of 8
    bytes) + Format, where ``X=F8;Y=F8;Z=F8;`` is a 24-byte XYZ
    sub-compound, ``DCX=F8;DCY=F8;`` a 16-byte pair, ``F8``/``I8``
    scalar float64/int64; TxAntenna/RcvAntenna children get a
    dotted prefix; AddedPVP nodes take their Name child; components
    sorted by offset when the XML lists them out of order;
  * channels (:659-766): one sub-group per Data.Channel named by its
    Identifier, holding a SignalBlock (NumVectors x NumSamples,
    big-endian complex — CI4/CI8/CF8/CF16 = CInt16/CInt32/CFloat32/
    CFloat64) and a PVP array of NumVectors records;
  * support arrays (:771-895): AntGainPhase/DwellTimeArray read as
    CFloat64, IAZArray as Float32 (the reference's exact band types),
    with element_format/x_0/y_0/xss/yss attributes.

Parity: tests/test_cphd.py asserts the full autotest/gdrivers/cphd.py
local-fixture expectation set against data/cphd/test.cphd (group
["1"], 25-component 360-byte PVPDataType, named offsets, all-zero
first vector, 1x1 complex64 zero signal sample).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

__all__ = ["read_cphd"]

# SignalArrayFormat -> numpy dtype (cphddataset.cpp:32-50; CI2/CI16
# are rejected there too)
_SIGNAL_DTYPES = {
    "CI4": np.dtype([("re", ">i2"), ("im", ">i2")]),
    "CI8": np.dtype([("re", ">i4"), ("im", ">i4")]),
    "CF8": np.dtype(">c8"),
    "CF16": np.dtype(">c16"),
}

_XYZ = np.dtype({"names": ["X", "Y", "Z"],
                 "formats": [">f8", ">f8", ">f8"],
                 "offsets": [0, 8, 16], "itemsize": 24})
_DCXY = np.dtype({"names": ["DCX", "DCY"],
                  "formats": [">f8", ">f8"],
                  "offsets": [0, 8], "itemsize": 16})


@dataclass
class CphdChannel:
    identifier: str
    signal: np.ndarray          # (NumVectors, NumSamples) complex
    pvp: np.ndarray             # structured, shape (NumVectors,)
    pvp_dtype_name: str = "PVPDataType"


@dataclass
class CphdFile:
    attributes: dict            # root attributes, insertion-ordered
    channels: dict              # identifier -> CphdChannel
    support_arrays: dict = field(default_factory=dict)

    @property
    def group_names(self):
        return list(self.channels)


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find_ci(node, name):
    """Case-insensitive single-child lookup (CPLGetXMLValue is
    case-insensitive on element names)."""
    low = name.lower()
    for ch in node:
        if _strip_ns(ch.tag).lower() == low:
            return ch
    return None


def _text_ci(node, path, default=None):
    cur = node
    for part in path.split("."):
        if cur is None:
            return default
        cur = _find_ci(cur, part)
    if cur is None or cur.text is None:
        return default
    return cur.text.strip()


def _parse_pvp_dtype(pvp_node):
    """PVP XML -> (numpy structured dtype, itemsize). Mirrors
    ParsePVPDataType (cphddataset.cpp:56-205): offsets are in 8-byte
    words, antenna sub-trees get dotted prefixes, AddedPVP uses its
    Name child, and the component list is sorted by offset when the
    document order disagrees."""
    comps = []                  # (name, offset_bytes, dtype)

    def walk(node, prefix=""):
        name = prefix + _strip_ns(node.tag)
        if _strip_ns(node.tag) in ("TxAntenna", "RcvAntenna"):
            for ch in node:
                walk(ch, _strip_ns(node.tag) + ".")
            return
        if _strip_ns(node.tag) == "AddedPVP":
            name = _text_ci(node, "Name", "")
        fmt = _text_ci(node, "Format")
        off = _text_ci(node, "Offset")
        if fmt is None or off is None:
            raise ValueError(f"CPHD PVP node {name}: missing Format/Offset")
        off = int(off) * 8
        if fmt == "X=F8;Y=F8;Z=F8;":
            comps.append((name, off, _XYZ))
        elif fmt == "DCX=F8;DCY=F8;":
            comps.append((name, off, _DCXY))
        elif fmt == "F8":
            comps.append((name, off, np.dtype(">f8")))
        elif fmt == "I8":
            comps.append((name, off, np.dtype(">i8")))
        else:
            raise ValueError(f"CPHD PVP format {fmt!r} not recognized")

    for ch in pvp_node:
        walk(ch)
    comps.sort(key=lambda c: c[1])
    itemsize = sum(c[2].itemsize for c in comps)
    dt = np.dtype({"names": [c[0] for c in comps],
                   "formats": [c[2] for c in comps],
                   "offsets": [c[1] for c in comps],
                   "itemsize": itemsize})
    return dt


def read_cphd(path: str) -> CphdFile:
    with open(path, "rb") as fh:
        buf = fh.read()

    # ---- text header up to the \f terminator ------------------------
    attrs: dict = {}
    blocks = {}
    end = buf.find(b"\f")
    if end < 0:
        raise ValueError("CPHD: no form-feed header terminator")
    named = {"CPHD": "cphd_version", "RELEASE_INFO": "release_info",
             "CLASSIFICATION": "classification"}
    for line in buf[:end].decode("ascii", "replace").splitlines():
        toks = [t for t in re.split(r"[ :=/]+", line) if t]
        if len(toks) != 2:
            continue
        key, val = toks
        ku = key.upper()
        if ku in named:
            attrs[named[ku]] = val
        elif ku.endswith(("_BLOCK_SIZE", "_BLOCK_BYTE_OFFSET")):
            blocks[ku] = int(val)
        else:
            attrs[key.lower()] = val

    xml_off = blocks.get("XML_BLOCK_BYTE_OFFSET", 0)
    xml_size = blocks.get("XML_BLOCK_SIZE", 0)
    if not (xml_off and xml_size):
        raise ValueError("CPHD: XML offset/size not found in header")
    xml_text = buf[xml_off:xml_off + xml_size].decode("utf-8", "replace")

    import xml.etree.ElementTree as ET
    root = ET.fromstring(xml_text)

    for attr, xpath in (("collect_type", "CollectionId.CollectType"),
                        ("collector_name", "CollectionId.CollectorName"),
                        ("core_name", "CollectionId.CoreName"),
                        ("radar_mode", "CollectionId.RadarMode.ModeType")):
        v = _text_ci(root, xpath)
        if v is not None:
            attrs[attr] = v
    attrs["xml"] = xml_text

    data = _find_ci(root, "Data")
    if data is None:
        raise ValueError("CPHD: no Data node in XML")
    sig_fmt = _text_ci(data, "SignalArrayFormat")
    n_bytes_pvp = _text_ci(data, "NumBytesPVP")
    pvp_dt = _parse_pvp_dtype(_find_ci(root, "PVP"))

    sig_dtype = _SIGNAL_DTYPES.get(sig_fmt or "")
    if sig_dtype is None:
        raise ValueError(f"CPHD signal format {sig_fmt!r} not supported")

    channels: dict = {}
    support: dict = {}
    for ch in data:
        tag = _strip_ns(ch.tag)
        if tag == "Channel":
            ident = _text_ci(ch, "Identifier", "")
            nvec = int(_text_ci(ch, "NumVectors"))
            nsamp = int(_text_ci(ch, "NumSamples"))
            sig_off = (blocks.get("SIGNAL_BLOCK_BYTE_OFFSET", 0)
                       + int(_text_ci(ch, "SignalArrayByteOffset", "0")))
            n = nvec * nsamp
            sig = np.frombuffer(buf, sig_dtype, n, sig_off)
            if sig.dtype.names:   # complex-int: promote to complex128
                sig = sig["re"].astype(np.float64) \
                    + 1j * sig["im"].astype(np.float64)
            sig = sig.reshape(nvec, nsamp)
            pvp_off = (blocks.get("PVP_BLOCK_BYTE_OFFSET", 0)
                       + int(_text_ci(ch, "PVPArrayByteOffset", "0")))
            if int(n_bytes_pvp) != pvp_dt.itemsize:
                raise ValueError(
                    f"CPHD: NumBytesPVP {n_bytes_pvp} != PVP compound "
                    f"size {pvp_dt.itemsize}")
            pvp = np.frombuffer(buf, pvp_dt, nvec, pvp_off)
            channels[ident] = CphdChannel(ident, sig, pvp)
        elif tag == "SupportArray":
            name = _text_ci(ch, "Identifier", "")
            sup_xml = _find_ci(root, "SupportArray")
            kind = None
            meta = {}
            if sup_xml is not None:
                for s in sup_xml:
                    if _text_ci(s, "Identifier", "") == name:
                        kind = _strip_ns(s.tag)
                        meta = {"element_format": _text_ci(
                                    s, "ElementFormat", ""),
                                "x_0": float(_text_ci(s, "X0", "0.")),
                                "y_0": float(_text_ci(s, "Y0", "0.")),
                                "xss": float(_text_ci(s, "XSS", "0.")),
                                "yss": float(_text_ci(s, "YSS", "0."))}
                        break
            if kind is None:
                continue
            rows = int(_text_ci(ch, "NumRows"))
            cols = int(_text_ci(ch, "NumCols"))
            off = (blocks.get("SUPPORT_BLOCK_BYTE_OFFSET", 0)
                   + int(_text_ci(ch, "ArrayByteOffset", "0")))
            if kind in ("AntGainPhase", "DwellTimeArray"):
                # the reference binds these as CFloat64 bands
                # (cphddataset.cpp:826-837)
                arr = np.frombuffer(buf, ">c16", rows * cols, off)
            elif kind == "IAZArray":
                arr = np.frombuffer(buf, ">f4", rows * cols, off)
            else:
                raise ValueError(f"CPHD support array {kind!r} unsupported")
            support[name] = {"data": arr.reshape(rows, cols), **meta}

    return CphdFile(attrs, channels, support)
