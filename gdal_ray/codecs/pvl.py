"""PVL / ODL keyword-label parser (PDS3, ISIS3 cube labels).

Reference semantics: frmts/pds/nasakeywordhandler.cpp — ``KEY = value``
lines with ``/* … */`` comments, quoted strings spanning lines,
``(…)``/``{…}`` aggregates spanning lines (mismatched closers are an
error), ``<UNIT>`` annotations kept inside the value text, and
OBJECT/GROUP blocks flattened to dotted key paths
(``IMAGE.SAMPLE_BITS``).  Aggregate values are stored with all
whitespace removed (the reference stores ``((1,2,3))``); scalar values
keep their text (quotes preserved — use :func:`clean` to strip).
"""

from __future__ import annotations

__all__ = ["parse_pvl", "clean", "sub_value", "unit_of"]


def _skip_ws(text: str, i: int) -> int:
    n = len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n\f\v":
            i += 1
        elif text.startswith("/*", i):
            j = text.find("*/", i + 2)
            i = n if j < 0 else j + 2
        elif c == "#" and (i == 0 or text[i - 1] in "\r\n"):
            # full-line # comment (some ISIS labels)
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
        else:
            break
    return i


def _read_token(text: str, i: int):
    """Bare word up to whitespace or '='."""
    j = i
    n = len(text)
    while j < n and text[j] not in " \t\r\n=" and \
            not text.startswith("/*", j):
        j += 1
    return text[i:j], j


_CLOSER = {"(": ")", "{": "}"}


def _read_value(text: str, i: int):
    """Read one (possibly multi-line) value starting at i → (value
    text, next index).  Mirrors the reference's tokenizer: quoted
    strings span lines; aggregates must balance with MATCHING closer
    types; a scalar runs to end of line but keeps a trailing <UNIT>."""
    n = len(text)
    i = _skip_ws(text, i)
    if i >= n:
        return "", i
    c = text[i]
    if c in "({":
        stack = [c]
        out = [c]
        j = i + 1
        in_q = None
        while j < n and stack:
            ch = text[j]
            if in_q:
                out.append(ch)
                if ch == in_q:
                    in_q = None
                j += 1
                continue
            if ch in "\"'":
                in_q = ch
                out.append(ch)
            elif text.startswith("/*", j):
                k = text.find("*/", j + 2)
                j = (n if k < 0 else k + 2) - 1
            elif ch in "({":
                stack.append(ch)
                out.append(ch)
            elif ch in ")}":
                if not stack or _CLOSER[stack[-1]] != ch:
                    raise ValueError(
                        f"unpaired aggregate delimiter {ch!r} in label")
                stack.pop()
                out.append(ch)
            elif ch not in " \t\r\n\f\v":
                out.append(ch)
            j += 1
        if stack:
            raise ValueError("unterminated aggregate in label")
        # trailing unit annotation (rare on aggregates) — skip
        return "".join(out), j
    if c in "\"'":
        j = text.find(c, i + 1)
        if j < 0:
            raise ValueError("unterminated quoted string in label")
        # collapse newline + indentation runs to a single space
        raw = text[i + 1:j]
        parts = [ln.strip() for ln in raw.splitlines()]
        body = " ".join(p for p in parts if p) if len(parts) > 1 else raw
        return c + body + c, j + 1
    # bare scalar: run to end of line (or comment), keep <UNIT> text
    j = i
    while j < n and text[j] not in "\r\n" and not text.startswith("/*", j):
        j += 1
    return text[i:j].strip(), j


def parse_pvl(text: str) -> dict[str, str]:
    """Label text → flat {dotted.path.KEY: value-text} dict."""
    out: dict[str, str] = {}
    path: list[str] = []
    i = 0
    n = len(text)
    while i < n:
        i = _skip_ws(text, i)
        if i >= n:
            break
        key, i = _read_token(text, i)
        if not key:
            i += 1
            continue
        ku = key.upper()
        if ku == "END":
            break
        i = _skip_ws(text, i)
        if i < n and text[i] == "=":
            value, i = _read_value(text, i + 1)
        else:
            value = ""
        if ku in ("OBJECT", "GROUP", "BEGIN_OBJECT", "BEGIN_GROUP"):
            path.append(clean(value))
        elif ku in ("END_OBJECT", "END_GROUP"):
            if path:
                path.pop()
        else:
            full = ".".join(path + [key])
            if full not in out:
                out[full] = value
    return out


def clean(value: str) -> str:
    """Strip surrounding quotes and outer whitespace (the reference's
    CleanString, minus its space→underscore rewrite for SRS names)."""
    v = value.strip()
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "\"'":
        v = v[1:-1]
    return v.strip()


def sub_value(value: str, idx: int, default: str = "") -> str:
    """idx-th (1-based) element of an ``(a,b,c)`` aggregate — the
    reference's GetKeywordSub."""
    v = value.strip()
    if not v.startswith("("):
        return default
    inner = v[1:v.rfind(")")] if ")" in v else v[1:]
    parts = []
    depth = 0
    cur = ""
    for ch in inner:
        if ch in "({":
            depth += 1
            cur += ch
        elif ch in ")}":
            depth -= 1
            cur += ch
        elif ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    if cur:
        parts.append(cur)
    if 1 <= idx <= len(parts):
        return parts[idx - 1].strip()
    return default


def unit_of(value: str) -> str:
    """First unit word inside ``<…>`` (``14.818 <KM/PIXEL>`` → KM)."""
    a = value.find("<")
    if a < 0:
        return ""
    b = value.find(">", a)
    unit = value[a + 1:b] if b > 0 else value[a + 1:]
    for sep in "/ *":
        unit = unit.split(sep)[0]
    return unit.strip()
