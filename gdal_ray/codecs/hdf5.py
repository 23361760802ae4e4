"""HDF5 reader — from-scratch structural parser for the classic
feature set the reference's HDF5/netCDF-4 drivers consume.

Reference: frmts/hdf5/hdf5dataset.cpp + frmts/netcdf (enhanced model)
wrap libhdf5; this module parses the public HDF5 File Format
Specification directly (no entropy coding — pure container walking):

  * superblock v0/v1 (+ signature search at 512·2^n) and v2/v3;
  * object headers v1 and v2 ("OHDR"), incl. continuation blocks;
  * old-style groups (symbol-table message → v1 B-tree + SNOD nodes +
    local heap) and new-style compact groups (link-info + link
    messages — what netCDF-4 emits for its creation-order tracking);
  * messages: dataspace, datatype (fixed/float/string/enum/compound/
    variable-length, either byte order), fill value, data layout
    (compact, contiguous, chunked v3 AND v4 with single-chunk /
    implicit / fixed-array / extensible-array / v2-B-tree chunk
    indexes), filter pipeline (deflate via zlib, shuffle, fletcher32
    passthrough), attributes (v1-v3);
  * chunked raw data via the v1 B-tree (node type 1) with per-chunk
    filter masks and edge-chunk clipping;
  * global heap (GCOL) for variable-length strings/sequences in
    attributes and compact/contiguous datasets;
  * family-VFD files (name_0.h5 … name_N.h5) via member
    concatenation (load_hdf5_bytes).

  * chunked raw data via layout-v4 chunk indexes too: single-chunk,
    implicit, fixed array, extensible array (incl. EADB data blocks
    and EASB super blocks) and v2 B-trees of any depth.

Virtual (VDS) layouts, chunked vlen datasets, and paged
extensible-array data blocks fail fast with a named error — the
documented boundary.

Goldens (tests/test_hdf5.py): the reference's own fixtures —
u8be.h5 checksum 135, groups.h5 //MyGroup/dset1 checksum 18
(autotest/gdrivers/hdf5.py:76,108), float32 LE/BE parity, deflate.h5,
and netCDF-4 trmm-nc4.nc pixel parity with the classic trmm.nc.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


class H5Object:
    """Parsed object header: messages + resolved links/attrs."""

    def __init__(self):
        self.links: dict[str, int] = {}      # name -> object header addr
        self.attrs: dict[str, object] = {}
        self.dataspace = None                # tuple dims or () scalar
        self.dtype = None                    # np.dtype | ("compound", …)
        self.layout = None
        self.filters: list[tuple[int, tuple]] = []
        self.fillvalue = None
        self.is_group = False


class Hdf5File:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.mv = memoryview(buf)
        off = self._find_superblock()
        if off:
            # user block: all file addresses are relative to the
            # superblock (base address) — rebase the address space
            self.buf = buf = buf[off:]
            self.mv = memoryview(buf)
            off = 0
        self._parse_superblock(off)
        self._objects: dict[int, H5Object] = {}
        self._gheaps: dict[int, dict[int, bytes]] = {}

    # ---------------------------------------------------------- superblock
    def _find_superblock(self) -> int:
        if self.buf[:8] == _SIG:
            return 0
        pos = 512
        while pos < len(self.buf):
            if self.buf[pos:pos + 8] == _SIG:
                return pos
            pos *= 2
        raise ValueError("not an HDF5 file (no superblock signature)")

    def _parse_superblock(self, off: int):
        b = self.buf
        ver = b[off + 8]
        self.sb_ver = ver
        if ver in (0, 1):
            so = b[off + 13]
            sl = b[off + 14]
            self.so, self.sl = so, sl
            p = off + 24
            if ver == 1:
                p += 4                      # indexed-storage k + reserved
            base = self._addr(p)
            p += 4 * so
            # root group symbol table entry
            p += so                          # link name offset
            self.root_addr = self._addr(p)
        elif ver in (2, 3):
            self.so = b[off + 9]
            self.sl = b[off + 10]
            p = off + 12
            p += self.so                     # base address
            p += self.so                     # superblock extension
            p += self.so                     # end of file
            self.root_addr = self._addr(p)
        else:
            raise ValueError(f"HDF5 superblock version {ver} unsupported")

    def _addr(self, pos: int) -> int:
        return int.from_bytes(self.buf[pos:pos + self.so], "little")

    def _len(self, pos: int) -> int:
        return int.from_bytes(self.buf[pos:pos + self.sl], "little")

    # ---------------------------------------------------------- global heap
    def _gheap(self, addr: int) -> dict[int, bytes]:
        """Global heap collection (GCOL) → {object index: bytes}."""
        if addr in self._gheaps:
            return self._gheaps[addr]
        b = self.buf
        if b[addr:addr + 4] != b"GCOL":
            raise ValueError("bad global heap collection")
        csize = self._len(addr + 8)
        end = addr + csize
        p = addr + 8 + self.sl
        out: dict[int, bytes] = {}
        while p + 8 + self.sl <= end:
            (idx,) = struct.unpack_from("<H", b, p)
            if idx == 0:                     # free-space terminator
                break
            osize = self._len(p + 8)
            q = p + 8 + self.sl
            out[idx] = bytes(b[q:q + osize])
            p = q + (osize + 7) // 8 * 8
        self._gheaps[addr] = out
        return out

    def _vlen_decode(self, raw: bytes, n: int, esize: int, desc):
        """n vlen elements (count(4) + gheap addr(so) + index(4) each,
        padded to esize) → list of str / bytes / ndarray."""
        _, vkind, sub = desc
        out = []
        for i in range(n):
            p = i * esize
            (cnt,) = struct.unpack_from("<I", raw, p)
            addr = int.from_bytes(raw[p + 4:p + 4 + self.so], "little")
            (idx,) = struct.unpack_from("<I", raw, p + 4 + self.so)
            if addr == 0 or addr == _UNDEF or idx == 0:
                out.append("" if vkind == "string" else
                           np.zeros(0, sub))
                continue
            data = self._gheap(addr)[idx]
            if vkind == "string":
                out.append(data[:cnt].decode("utf-8", "replace")
                           .rstrip("\x00"))
            else:
                out.append(np.frombuffer(data, sub, count=cnt))
        return out

    # ---------------------------------------------------------- objects
    def obj(self, addr: int) -> H5Object:
        if addr not in self._objects:
            o = H5Object()
            self._objects[addr] = o
            self._parse_object_header(addr, o)
        return self._objects[addr]

    def _parse_object_header(self, addr: int, o: H5Object):
        b = self.buf
        if b[addr:addr + 4] == b"OHDR":
            self._parse_ohdr_v2(addr, o)
            return
        ver = b[addr]
        if ver != 1:
            raise ValueError(f"object header version {ver} unsupported")
        (nmsg,) = struct.unpack_from("<H", b, addr + 2)
        (hsize,) = struct.unpack_from("<I", b, addr + 8)
        blocks = [(addr + 16, hsize)]
        self._walk_messages_v1(blocks, nmsg, o)

    def _walk_messages_v1(self, blocks, nmsg, o):
        b = self.buf
        seen = 0
        bi = 0
        while bi < len(blocks) and seen < nmsg:
            pos, size = blocks[bi]
            end = pos + size
            while pos + 8 <= end and seen < nmsg:
                mtype, msize = struct.unpack_from("<HH", b, pos)
                body = pos + 8
                self._message(mtype, body, msize, o, blocks)
                pos = body + msize
                seen += 1
            bi += 1

    def _parse_ohdr_v2(self, addr: int, o: H5Object):
        b = self.buf
        flags = b[addr + 5]
        p = addr + 6
        if flags & 0x20:
            p += 16                         # times
        if flags & 0x10:
            p += 4                          # max compact / min dense
        size_bytes = 1 << (flags & 0x3)
        size = int.from_bytes(b[p:p + size_bytes], "little")
        p += size_bytes
        blocks = [(p, size, flags)]
        bi = 0
        while bi < len(blocks):
            pos, bsize, bflags = blocks[bi]
            end = pos + bsize - 4           # gateway checksum
            while pos + 4 <= end:
                mtype = b[pos]
                (msize,) = struct.unpack_from("<H", b, pos + 1)
                p2 = pos + 4
                if bflags & 0x04:
                    p2 += 2                 # creation order
                self._message(mtype, p2, msize, o, blocks, v2=True,
                              v2flags=bflags)
                pos = p2 + msize
            bi += 1

    # ---------------------------------------------------------- messages
    def _message(self, mtype, body, msize, o, blocks, v2=False,
                 v2flags=0):
        b = self.buf
        if mtype == 0x0001:                 # dataspace
            o.dataspace = self._parse_dataspace(body)
        elif mtype == 0x0003:               # datatype
            o.dtype = self._parse_datatype(body)[0]
        elif mtype == 0x0005:               # fill value
            o.fillvalue = self._parse_fill(body)
        elif mtype == 0x0006:               # link message (new groups)
            self._parse_link(body, o)
        elif mtype == 0x0008:               # layout
            o.layout = self._parse_layout(body)
        elif mtype == 0x000B:               # filter pipeline
            o.filters = self._parse_filters(body)
        elif mtype == 0x000C:               # attribute
            name, val = self._parse_attribute(body)
            if name is not None:
                o.attrs[name] = val
        elif mtype == 0x0010:               # continuation
            addr = self._addr(body)
            length = self._len(body + self.so)
            if v2:
                # v2 continuation blocks start with "OCHK" and end
                # with a checksum
                if b[addr:addr + 4] != b"OCHK":
                    raise ValueError("bad OCHK continuation")
                blocks.append((addr + 4, length - 4, v2flags))
            else:
                blocks.append((addr, length))
        elif mtype == 0x0011:               # symbol table (old group)
            o.is_group = True
            btree = self._addr(body)
            heap = self._addr(body + self.so)
            self._walk_group_btree(btree, heap, o)
        elif mtype == 0x0002:               # link info (new group)
            o.is_group = True
            flags = b[body + 1]
            p = body + 2
            if flags & 0x1:
                p += 8                      # max creation index
            fheap = self._addr(p)
            name_btree = self._addr(p + self.so)
            if fheap != _UNDEF:
                # dense links: v2 B-tree name index → fractal heap
                # objects, each a raw link message (netCDF-4 writes
                # every group this way for creation-order tracking)
                heap = _FractalHeap(self, fheap)
                for rec in self._btree2_records(name_btree):
                    pos = heap.locate(rec[4:4 + heap.id_len])
                    self._parse_link(pos, o)
        elif mtype == 0x0015:               # attribute info (dense)
            flags = b[body + 1]
            p = body + 2
            if flags & 0x1:
                p += 2                      # max creation index
            fheap = self._addr(p)
            name_btree = self._addr(p + self.so)
            if fheap != _UNDEF:
                heap = _FractalHeap(self, fheap)
                for rec in self._btree2_records(name_btree):
                    # type-8 record: heap ID (8) + flags (1) +
                    # creation order (4) + name hash (4)
                    pos = heap.locate(rec[:heap.id_len])
                    name, val = self._parse_attribute(pos)
                    if name is not None:
                        o.attrs[name] = val

    def _parse_dataspace(self, p):
        b = self.buf
        ver = b[p]
        if ver == 1:
            rank = b[p + 1]
            flags = b[p + 2]
            q = p + 8
        else:
            rank = b[p + 1]
            flags = b[p + 2]
            q = p + 4
        dims = []
        for _ in range(rank):
            dims.append(self._len(q))
            q += self.sl
        return tuple(dims)

    def _parse_datatype(self, p):
        """→ (descriptor, total size). Descriptor: np.dtype for atomic
        types, ("compound", [(name, offset, sub)], size) otherwise."""
        b = self.buf
        cls_ver = b[p]
        cls = cls_ver & 0x0F
        ver = cls_ver >> 4
        bits = b[p + 1:p + 4]
        (size,) = struct.unpack_from("<I", b, p + 4)
        order = ">" if (bits[0] & 1) else "<"
        if cls == 0:                        # fixed point
            signed = "i" if (bits[0] & 0x08) else "u"
            return np.dtype(f"{order}{signed}{size}"), size
        if cls == 1:                        # float
            return np.dtype(f"{order}f{size}"), size
        if cls == 3:                        # string
            return np.dtype(f"S{size}"), size
        if cls == 8:                        # enum: read base type
            sub, _ = self._parse_datatype(p + 8)
            return sub, size
        if cls == 9:                        # variable-length
            # bits0 low nibble: 0 = sequence, 1 = string; element on
            # disk = count(4) + global-heap collection addr(so) +
            # object index(4), padded to `size`
            vkind = "string" if (bits[0] & 0x0F) == 1 else "sequence"
            sub, _ = self._parse_datatype(p + 8)
            return ("vlen", vkind, sub), size
        if cls == 6:                        # compound
            nmem = bits[0] | (bits[1] << 8)
            members = []
            q = p + 8
            for _ in range(nmem):
                if ver == 1:
                    nend = b.index(b"\x00", q)
                    name = b[q:nend].decode()
                    q += ((nend - q) // 8 + 1) * 8
                    (moff,) = struct.unpack_from("<I", b, q)
                    q += 4 + 1 + 3 + 4 + 4 + 16
                elif ver == 2:
                    nend = b.index(b"\x00", q)
                    name = b[q:nend].decode()
                    q += ((nend - q) // 8 + 1) * 8
                    (moff,) = struct.unpack_from("<I", b, q)
                    q += 4
                else:                       # v3: compact name + offset
                    nend = b.index(b"\x00", q)
                    name = b[q:nend].decode()
                    q = nend + 1
                    nb = max(1, (size.bit_length() + 7) // 8)
                    moff = int.from_bytes(b[q:q + nb], "little")
                    q += nb
                sub, ssize = self._parse_datatype(q)
                q += self._datatype_total(q)
                members.append((name, moff, sub))
            return ("compound", members, size), size
        raise ValueError(f"HDF5 datatype class {cls} unsupported")

    def _datatype_total(self, p) -> int:
        """Byte length of a datatype message starting at p (needed to
        step over nested compound members)."""
        b = self.buf
        cls = b[p] & 0x0F
        ver = b[p] >> 4
        (size,) = struct.unpack_from("<I", b, p + 4)
        if cls in (0, 4):
            return 8 + 4                    # properties: offset+precision
        if cls == 3:
            return 8                        # string: no property bytes
        if cls == 1:
            return 8 + 12
        if cls == 9:                        # vlen: base type follows
            return 8 + self._datatype_total(p + 8)
        if cls == 8:
            # base type + names/values — not nested further in practice
            raise ValueError("nested enum in compound unsupported")
        if cls == 6:
            bits = b[p + 1:p + 4]
            nmem = bits[0] | (bits[1] << 8)
            q = p + 8
            for _ in range(nmem):
                nend = b.index(b"\x00", q)
                if ver in (1, 2):
                    q += ((nend - q) // 8 + 1) * 8
                    q += 4 + (1 + 3 + 4 + 4 + 16 if ver == 1 else 0)
                else:
                    q = nend + 1
                    q += max(1, (size.bit_length() + 7) // 8)
                q += self._datatype_total(q)
            return q - p
        raise ValueError(f"HDF5 datatype class {cls} unsupported")

    def _parse_fill(self, p):
        b = self.buf
        ver = b[p]
        if ver in (1, 2):
            defined = b[p + 3]
            if ver == 2 and not defined:
                return None
            (sz,) = struct.unpack_from("<I", b, p + 4)
            return bytes(b[p + 8:p + 8 + sz]) if sz else None
        # v3
        flags = b[p + 1]
        if flags & 0x20:                    # fill value defined
            (sz,) = struct.unpack_from("<I", b, p + 2)
            return bytes(b[p + 6:p + 6 + sz]) if sz else None
        return None

    def _parse_link(self, p, o):
        b = self.buf
        flags = b[p + 1]
        q = p + 2
        ltype = 0
        if flags & 0x08:
            ltype = b[q]
            q += 1
        if flags & 0x04:
            q += 8                          # creation order
        if flags & 0x10:
            q += 1                          # charset
        nlen = int.from_bytes(b[q:q + (1 << (flags & 0x3))], "little")
        q += 1 << (flags & 0x3)
        name = b[q:q + nlen].decode()
        q += nlen
        if ltype == 0:                      # hard link
            o.links[name] = self._addr(q)
            o.is_group = True

    def _parse_layout(self, p):
        b = self.buf
        ver = b[p]
        if ver in (1, 2):
            # v1/2: dimensionality(1), class(1), reserved(5), then
            # [btree/data address], dim sizes (4 each; chunked's last
            # is the element size), compact adds size(4)+data
            rank = b[p + 1]
            cls = b[p + 2]
            q = p + 8
            if cls == 1:
                addr = self._addr(q)
                q += self.so
                return ("contiguous", addr, 0)
            if cls == 2:
                addr = self._addr(q)
                q += self.so
                dims = struct.unpack_from(f"<{rank}I", b, q)
                return ("chunked", addr, dims[:-1], dims[-1])
            if cls == 0:
                q += 4 * rank
                (sz,) = struct.unpack_from("<I", b, q)
                return ("compact", bytes(b[q + 4:q + 4 + sz]))
            raise ValueError(f"layout class {cls} unsupported")
        if ver == 4:
            return self._parse_layout_v4(p)
        if ver != 3:
            raise ValueError(f"data layout version {ver} unsupported")
        cls = b[p + 1]
        q = p + 2
        if cls == 0:                        # compact
            (sz,) = struct.unpack_from("<H", b, q)
            return ("compact", bytes(b[q + 2:q + 2 + sz]))
        if cls == 1:                        # contiguous
            addr = self._addr(q)
            size = self._len(q + self.so)
            return ("contiguous", addr, size)
        if cls == 2:                        # chunked
            rank = b[q]                     # = dataset rank + 1
            q += 1
            btree = self._addr(q)
            q += self.so
            dims = struct.unpack_from(f"<{rank}I", b, q)
            return ("chunked", btree, dims[:-1], dims[-1])
        raise ValueError(f"data layout class {cls} unsupported")

    def _parse_layout_v4(self, p):
        """Data layout message v4 (HDF5 1.10+): compact/contiguous as
        v3; chunked carries one of five chunk-index types — single
        chunk (1), implicit (2), fixed array (3), extensible array
        (4), v2 B-tree (5). Virtual layout (class 3) fails fast."""
        b = self.buf
        cls = b[p + 1]
        q = p + 2
        if cls == 0:                        # compact
            (sz,) = struct.unpack_from("<H", b, q)
            return ("compact", bytes(b[q + 2:q + 2 + sz]))
        if cls == 1:                        # contiguous
            addr = self._addr(q)
            size = self._len(q + self.so)
            return ("contiguous", addr, size)
        if cls == 3:
            raise ValueError("virtual data layout (VDS) unsupported")
        if cls != 2:
            raise ValueError(f"data layout v4 class {cls} unsupported")
        flags = b[q]
        q += 1
        rank = b[q]                         # = dataset rank + 1 (last
        q += 1                              # dim is the element size)
        enclen = b[q]
        q += 1
        dims = tuple(int.from_bytes(b[q + i * enclen:
                                      q + (i + 1) * enclen], "little")
                     for i in range(rank))
        q += rank * enclen
        itype = b[q]
        q += 1
        idx_info = None
        if itype == 1:                      # single chunk
            if flags & 0x02:                # filtered: size + mask
                fsz = self._len(q)
                q += self.sl
                (mask,) = struct.unpack_from("<I", b, q)
                q += 4
                idx_info = (fsz, mask)
        elif itype == 2:                    # implicit: no index data
            pass
        elif itype == 3:                    # fixed array
            q += 1                          # page bits
        elif itype == 4:                    # extensible array
            q += 5                          # max-bits, index elts,
            #                                 min ptrs, min elts,
            #                                 page bits
        elif itype == 5:                    # v2 B-tree
            q += 6                          # node size(4), split/merge %
        else:
            raise ValueError(f"chunk index type {itype} unsupported")
        addr = self._addr(q)
        return ("chunked4", itype, addr, dims[:-1], dims[-1], flags,
                idx_info)

    def _parse_filters(self, p):
        b = self.buf
        ver = b[p]
        nf = b[p + 1]
        q = p + 8 if ver == 1 else p + 2
        out = []
        for _ in range(nf):
            (fid,) = struct.unpack_from("<H", b, q)
            q += 2
            nlen = 0
            if ver == 1 or fid >= 256:      # v2 omits the name length
                (nlen,) = struct.unpack_from("<H", b, q)  # for id<256
                q += 2
            q += 2                          # flags
            (ncv,) = struct.unpack_from("<H", b, q)
            q += 2
            if nlen:
                q += ((nlen + 7) // 8 * 8) if ver == 1 else nlen
            cvals = struct.unpack_from(f"<{ncv}I", b, q)
            q += 4 * ncv
            if ver == 1 and ncv % 2:
                q += 4
            out.append((fid, cvals))
        return out

    def _parse_attribute(self, p):
        b = self.buf
        ver = b[p]
        if ver == 1:
            (nsz,) = struct.unpack_from("<H", b, p + 2)
            (dsz,) = struct.unpack_from("<H", b, p + 4)
            (ssz,) = struct.unpack_from("<H", b, p + 6)
            q = p + 8
            name = b[q:q + nsz].split(b"\x00")[0].decode()
            q += (nsz + 7) // 8 * 8
            tpos = q
            q += (dsz + 7) // 8 * 8
            spos = q
            q += (ssz + 7) // 8 * 8
        elif ver in (2, 3):
            (nsz,) = struct.unpack_from("<H", b, p + 2)
            (dsz,) = struct.unpack_from("<H", b, p + 4)
            (ssz,) = struct.unpack_from("<H", b, p + 6)
            q = p + 8 + (1 if ver == 3 else 0)
            name = b[q:q + nsz].split(b"\x00")[0].decode()
            q += nsz
            tpos = q
            q += dsz
            spos = q
            q += ssz
        else:
            return None, None
        try:
            dt, esize = self._parse_datatype(tpos)
            dims = self._parse_dataspace(spos)
        except ValueError:
            return name, None               # reference attr: skip
        n = int(np.prod(dims)) if dims else 1
        raw = bytes(b[q:q + n * esize])
        if isinstance(dt, tuple) and dt[0] == "vlen":
            vals = self._vlen_decode(raw, n, esize, dt)
            if n == 1:
                return name, vals[0]
            if dt[1] == "string":           # GDAL joins string-array
                return name, " ".join(vals)  # metadata with spaces
            return name, vals
        if isinstance(dt, tuple):
            return name, raw                # compound attr: raw bytes
        arr = np.frombuffer(raw, dt, count=n)
        if dt.kind == "S":
            val = arr[0].split(b"\x00")[0].decode("utf-8", "replace") \
                if n == 1 else [v.split(b"\x00")[0].decode("utf-8",
                                                           "replace")
                                for v in arr]
        else:
            val = arr[0].item() if n == 1 else arr.tolist()
        return name, val

    def _btree2_records(self, addr: int) -> list[bytes]:
        """v2 B-tree → raw records (leaf walk; depth-0 and depth-1
        trees — netCDF-4 groups stay shallow)."""
        b = self.buf
        if addr == _UNDEF:
            return []
        if b[addr:addr + 4] != b"BTHD":
            raise ValueError("bad v2 B-tree header")
        (node_size,) = struct.unpack_from("<I", b, addr + 6)
        (rec_size,) = struct.unpack_from("<H", b, addr + 10)
        (depth,) = struct.unpack_from("<H", b, addr + 12)
        p = addr + 16
        root = self._addr(p)
        p += self.so
        (root_nrec,) = struct.unpack_from("<H", b, p)

        def leaf(a, n):
            if b[a:a + 4] != b"BTLF":
                raise ValueError("bad v2 B-tree leaf")
            q = a + 6
            return [bytes(b[q + i * rec_size:q + (i + 1) * rec_size])
                    for i in range(n)]

        if root == _UNDEF:
            return []
        if depth == 0:
            return leaf(root, root_nrec)

        # per-depth node geometry (H5B2hdr.c): an internal node at
        # depth u stores n records + n+1 child pointers, a pointer
        # being child addr + child record count (min bytes for the
        # child node's max) + — when the child is itself internal —
        # the cumulative subtree record count (min bytes for the
        # subtree max)
        def minb(n):
            return max(1, (int(n).bit_length() + 7) // 8)

        leaf_max = (node_size - 10) // rec_size
        info = [(leaf_max, leaf_max)]        # (node max, subtree max)
        for u in range(1, depth + 1):
            cmax, ccum = info[u - 1]
            ptr = self.so + minb(cmax) + (minb(ccum) if u > 1 else 0)
            nmax = (node_size - (10 + ptr)) // (rec_size + ptr)
            info.append((nmax, (nmax + 1) * ccum + nmax))

        def walk(a, n, d):
            if d == 0:
                return leaf(a, n)
            if b[a:a + 4] != b"BTIN":
                raise ValueError("bad v2 B-tree internal node")
            out = []
            q = a + 6
            for _ in range(n):               # records first …
                out.append(bytes(b[q:q + rec_size]))
                q += rec_size
            cmax, ccum = info[d - 1]
            for _ in range(n + 1):           # … then child pointers
                caddr = self._addr(q)
                q += self.so
                cn = int.from_bytes(b[q:q + minb(cmax)], "little")
                q += minb(cmax)
                if d > 1:
                    q += minb(ccum)          # subtree total, unused
                out.extend(walk(caddr, cn, d - 1))
            return out

        return walk(root, root_nrec, depth)

    # ---------------------------------------------------------- groups
    def _walk_group_btree(self, btree_addr, heap_addr, o):
        b = self.buf
        if b[heap_addr:heap_addr + 4] != b"HEAP":
            raise ValueError("bad local heap")
        heap_data = self._addr(heap_addr + 8 + 2 * self.sl)

        def walk(node_addr):
            if b[node_addr:node_addr + 4] == b"TREE":
                level = b[node_addr + 5]
                (used,) = struct.unpack_from("<H", b, node_addr + 6)
                p = node_addr + 8 + 2 * self.so
                p += self.sl                 # key 0
                for _ in range(used):
                    child = self._addr(p)
                    p += self.so + self.sl
                    walk(child)
            elif b[node_addr:node_addr + 4] == b"SNOD":
                (count,) = struct.unpack_from("<H", b, node_addr + 6)
                p = node_addr + 8
                for _ in range(count):
                    name_off = self._len(p)
                    ohdr = self._addr(p + self.so)
                    nend = b.index(b"\x00", heap_data + name_off)
                    name = b[heap_data + name_off:nend].decode()
                    o.links[name] = ohdr
                    p += 2 * self.so + 4 + 4 + 16
            else:
                raise ValueError("bad group B-tree node")

        walk(btree_addr)

    # ---------------------------------------------------------- datasets
    def visit(self):
        """→ {path: H5Object} for every reachable object."""
        out: dict[str, H5Object] = {}

        def rec(addr, path, depth):
            if depth > 32:
                return
            o = self.obj(addr)
            out[path or "/"] = o
            for name, child in o.links.items():
                rec(child, f"{path}/{name}", depth + 1)

        rec(self.root_addr, "", 0)
        return out

    def datasets(self) -> dict[str, H5Object]:
        return {p: o for p, o in self.visit().items()
                if o.layout is not None and o.dataspace is not None}

    def _apply_filters(self, raw: bytes, filters, mask: int) -> bytes:
        for k, (fid, cvals) in enumerate(reversed(filters)):
            i = len(filters) - 1 - k
            if mask & (1 << i):
                continue
            if fid == 1:                    # deflate
                raw = zlib.decompress(raw)
            elif fid == 2:                  # shuffle
                es = cvals[0] if cvals else 1
                if es > 1 and len(raw) % es == 0:
                    a = np.frombuffer(raw, np.uint8)
                    raw = a.reshape(es, -1).T.tobytes()
            elif fid == 3:                  # fletcher32: strip checksum
                raw = raw[:-4]
            else:
                raise ValueError(f"HDF5 filter id {fid} unsupported")
        return raw

    def read(self, path: str) -> np.ndarray:
        ds = self.visit()[path]
        dims = ds.dataspace
        dt = ds.dtype
        if isinstance(dt, tuple) and dt[0] == "vlen":
            return self._read_vlen(ds, dims, dt)
        if isinstance(dt, tuple):           # compound → structured view
            _, members, csize = dt
            fields = {}
            for name, moff, sub in members:
                fields[name] = (sub, moff)
            dt_np = np.dtype({"names": [m[0] for m in members],
                              "formats": [m[2] for m in members],
                              "offsets": [m[1] for m in members],
                              "itemsize": csize})
            esize = csize
        else:
            dt_np = dt
            esize = dt.itemsize
        n = int(np.prod(dims)) if dims else 1
        kind, *rest = ds.layout
        if kind == "compact":
            return np.frombuffer(rest[0], dt_np, count=n).reshape(dims)
        if kind == "contiguous":
            addr, size = rest
            if addr == _UNDEF:              # never allocated: fill
                return self._fill_array(ds, dt_np, dims, n)
            raw = bytes(self.mv[addr:addr + n * esize])
            return np.frombuffer(raw, dt_np, count=n).reshape(dims)
        if kind == "chunked4":
            itype, addr, cdims, celem, flags, idx_info = rest
            out = self._fill_array(ds, dt_np, dims, n)
            if addr == _UNDEF:
                return out
            for ci, (caddr, csize, mask) in enumerate(
                    self._chunks4_entries(itype, addr, dims, cdims,
                                          esize, idx_info)):
                if caddr == _UNDEF or caddr == 0:
                    continue
                self._place_chunk(ds, out, cdims, dt_np, caddr, csize,
                                  mask, self._chunk_offset(ci, dims,
                                                           cdims))
            return out
        # chunked (v1/v3: v1 B-tree index)
        btree, cdims, celem = rest
        out = self._fill_array(ds, dt_np, dims, n)
        if btree == _UNDEF:
            return out
        self._read_chunks(btree, ds, out, cdims, dt_np, esize)
        return out

    def _read_vlen(self, ds, dims, dt):
        """Variable-length dataset → numpy object array (strings or
        per-element arrays), elements resolved via the global heap.
        Chunked layouts assemble the fixed-size vlen descriptors
        (count + GCOL addr + index) through the ordinary chunk
        walkers with a void dtype, then resolve the heap IDs."""
        n = int(np.prod(dims)) if dims else 1
        esize = 4 + self.so + 4
        kind, *rest = ds.layout
        if kind == "compact":
            raw = rest[0]
        elif kind == "contiguous":
            addr, _ = rest
            if addr == _UNDEF:
                raw = b"\x00" * (n * esize)
            else:
                raw = bytes(self.mv[addr:addr + n * esize])
        else:
            dtv = np.dtype(f"V{esize}")
            outv = np.zeros(n, dtv).reshape(dims if dims else (1,))
            if kind == "chunked4":
                itype, addr, cdims, celem, flags, idx_info = rest
                if addr != _UNDEF:
                    for ci, (caddr, csize, mask) in enumerate(
                            self._chunks4_entries(itype, addr, dims,
                                                  cdims, esize,
                                                  idx_info)):
                        if caddr == _UNDEF or caddr == 0:
                            continue
                        self._place_chunk(
                            ds, outv, cdims, dtv, caddr, csize, mask,
                            self._chunk_offset(ci, dims, cdims))
            else:                           # chunked v1/v3 B-tree
                btree, cdims, celem = rest
                if btree != _UNDEF:
                    self._read_chunks(btree, ds, outv, cdims, dtv,
                                      esize)
            raw = outv.tobytes()
        vals = self._vlen_decode(raw, n, esize, dt)
        out = np.empty(n, object)
        out[:] = vals
        return out.reshape(dims) if dims else out

    # ------------------------------------------------ v4 chunk indexes
    def _chunk_offset(self, ci, dims, cdims):
        """Linear chunk index → element offsets (row-major grid)."""
        grid = [(d + c - 1) // c for d, c in zip(dims, cdims)]
        offs = []
        for g, c in zip(reversed(grid), reversed(cdims)):
            offs.append((ci % g) * c)
            ci //= g
        return tuple(reversed(offs))

    def _place_chunk(self, ds, out, cdims, dt_np, caddr, csize, mask,
                     offs):
        raw = bytes(self.mv[caddr:caddr + csize]) if csize else \
            bytes(self.mv[caddr:caddr
                          + int(np.prod(cdims)) * dt_np.itemsize])
        if ds.filters and mask is not None:
            raw = self._apply_filters(raw, ds.filters, mask)
        chunk = np.frombuffer(raw, dt_np,
                              count=int(np.prod(cdims))).reshape(cdims)
        sl_out, sl_in = [], []
        for d in range(len(cdims)):
            take = min(cdims[d], out.shape[d] - offs[d])
            if take <= 0:
                return
            sl_out.append(slice(offs[d], offs[d] + take))
            sl_in.append(slice(0, take))
        out[tuple(sl_out)] = chunk[tuple(sl_in)]

    def _chunks4_entries(self, itype, addr, dims, cdims, esize,
                         idx_info):
        """v4 chunk index → [(chunk addr, stored size, filter mask)]
        in linear (row-major grid) chunk order. stored size 0 means
        unfiltered (esize × chunk elements)."""
        b = self.buf
        nchunks = int(np.prod([(d + c - 1) // c
                               for d, c in zip(dims, cdims)]))
        if itype == 1:                      # single chunk
            if idx_info is not None:
                return [(addr, idx_info[0], idx_info[1])]
            return [(addr, 0, None)]
        if itype == 2:                      # implicit: contiguous, raw
            csz = int(np.prod(cdims)) * esize
            return [(addr + i * csz, 0, None) for i in range(nchunks)]
        if itype == 3:                      # fixed array
            return self._fixed_array_entries(addr, nchunks)
        if itype == 4:                      # extensible array
            return self._ext_array_entries(addr, nchunks)
        if itype == 5:                      # v2 B-tree, record type 10
            recs = self._btree2_records(addr)
            rank = len(cdims)
            out = [(_UNDEF, 0, None)] * nchunks
            grid = [(d + c - 1) // c for d, c in zip(dims, cdims)]
            for r in recs:
                caddr = int.from_bytes(r[:self.so], "little")
                offs = struct.unpack_from(f"<{rank}Q", r, self.so)
                ci = 0
                for g, o, c in zip(grid, offs, cdims):
                    ci = ci * g + o // c
                if 0 <= ci < nchunks:
                    out[ci] = (caddr, 0, None)
            return out
        raise ValueError(f"chunk index type {itype} unsupported")

    def _fixed_array_entries(self, addr, nchunks):
        """Fixed-array chunk index (FAHD header + FADB data block,
        unpaged)."""
        b = self.buf
        if b[addr:addr + 4] != b"FAHD":
            raise ValueError("bad fixed-array header")
        entry_size = b[addr + 6]
        dblk = self._addr(addr + 7 + 1 + self.sl)
        if dblk == _UNDEF:
            return []
        if b[dblk:dblk + 4] != b"FADB":
            raise ValueError("bad fixed-array data block")
        # sig(4) ver(1) client(1) hdr addr(so) page-bitmap? (unpaged:
        # elements follow directly)
        p = dblk + 6 + self.so
        out = []
        for _ in range(nchunks):
            caddr = int.from_bytes(b[p:p + self.so], "little")
            if entry_size > self.so:        # filtered: size + mask
                szlen = entry_size - self.so - 4
                csz = int.from_bytes(b[p + self.so:p + self.so + szlen],
                                     "little")
                (mask,) = struct.unpack_from("<I", b,
                                             p + self.so + szlen)
                out.append((caddr, csz, mask))
            else:
                out.append((caddr, 0, None))
            p += entry_size
        return out

    def _ext_array_entries(self, addr, nchunks):
        """Extensible-array chunk index: EAHD header → EAIB index
        block → EADB data blocks / EASB super blocks. Geometry follows
        H5EA: super block u holds 2^(u/2) data blocks of
        dblk_min_elmts·2^((u+1)/2) elements each, and the data blocks
        of the first 2·log2(sblk_min_dblk_ptrs) super blocks are
        addressed directly from the index block (H5EApkg.h
        H5EA_SBLK_FIRST_IDX). Paged data blocks (element count above
        2^dblk_page_nelmts_bits) fail fast."""
        b = self.buf
        if b[addr:addr + 4] != b"EAHD":
            raise ValueError("bad extensible-array header")
        elt_size = b[addr + 6]
        max_bits = b[addr + 7]
        idx_blk_elts = b[addr + 8]
        dblk_min = b[addr + 9]
        sblk_min_ptrs = b[addr + 10]
        page_bits = b[addr + 11]
        p = addr + 12 + 6 * self.sl
        iblk = self._addr(p)
        if iblk == _UNDEF:
            return []
        if b[iblk:iblk + 4] != b"EAIB":
            raise ValueError("bad extensible-array index block")
        off_size = (max_bits + 7) // 8      # block-offset field width
        page_nelmts = 1 << page_bits

        def parse_elt(q):
            caddr = int.from_bytes(b[q:q + self.so], "little")
            if elt_size > self.so:          # filtered
                szlen = elt_size - self.so - 4
                csz = int.from_bytes(
                    b[q + self.so:q + self.so + szlen], "little")
                (mask,) = struct.unpack_from("<I", b,
                                             q + self.so + szlen)
                return (caddr, csz, mask)
            return (caddr, 0, None)

        q = iblk + 6 + self.so
        out = []
        for _ in range(min(nchunks, idx_blk_elts)):
            out.append(parse_elt(q))
            q += elt_size
        if nchunks <= idx_blk_elts:
            return out
        q = iblk + 6 + self.so + idx_blk_elts * elt_size

        def read_dblk(daddr, nelmts, need):
            if daddr == _UNDEF:
                return [(_UNDEF, 0, None)] * min(nelmts, need)
            if b[daddr:daddr + 4] != b"EADB":
                raise ValueError("bad extensible-array data block")
            if nelmts > page_nelmts:
                raise ValueError(
                    "paged extensible-array data blocks unsupported")
            r = daddr + 6 + self.so + off_size
            return [parse_elt(r + i * elt_size)
                    for i in range(min(nelmts, need))]

        nsblks = 1 + (max_bits - (dblk_min.bit_length() - 1))
        first_idx = min(2 * (sblk_min_ptrs.bit_length() - 1), nsblks)
        need = nchunks - idx_blk_elts
        for u in range(first_idx):          # dblk addrs in index block
            ne = dblk_min << ((u + 1) // 2)
            for _ in range(1 << (u // 2)):
                if need > 0:
                    daddr = int.from_bytes(b[q:q + self.so], "little")
                    got = read_dblk(daddr, ne, need)
                    out.extend(got)
                    need -= len(got)
                q += self.so
        for u in range(first_idx, nsblks):  # sblk addrs follow
            if need <= 0:
                break
            saddr = int.from_bytes(b[q:q + self.so], "little")
            q += self.so
            ndblks = 1 << (u // 2)
            ne = dblk_min << ((u + 1) // 2)
            if saddr == _UNDEF:
                cnt = min(ndblks * ne, need)
                out.extend([(_UNDEF, 0, None)] * cnt)
                need -= cnt
                continue
            if b[saddr:saddr + 4] != b"EASB":
                raise ValueError("bad extensible-array super block")
            r = saddr + 6 + self.so + off_size
            for i in range(ndblks):
                if need <= 0:
                    break
                daddr = int.from_bytes(
                    b[r + i * self.so:r + (i + 1) * self.so], "little")
                got = read_dblk(daddr, ne, need)
                out.extend(got)
                need -= len(got)
        if need > 0:
            raise ValueError("extensible-array index short of "
                             f"{need} chunk entries")
        return out

    def _fill_array(self, ds, dt_np, dims, n):
        out = np.zeros(n, dt_np)
        if ds.fillvalue and not isinstance(dt_np, tuple) \
                and len(ds.fillvalue) == dt_np.itemsize:
            out[:] = np.frombuffer(ds.fillvalue, dt_np)[0]
        return out.reshape(dims)

    def _read_chunks(self, node_addr, ds, out, cdims, dt_np, esize):
        b = self.buf
        rank = len(cdims)

        def walk(addr):
            if b[addr:addr + 4] != b"TREE":
                raise ValueError("bad chunk B-tree node")
            ntype = b[addr + 4]
            level = b[addr + 5]
            (used,) = struct.unpack_from("<H", b, addr + 6)
            p = addr + 8 + 2 * self.so
            key_size = 8 + 8 * (rank + 1)
            for _ in range(used):
                (csize, mask) = struct.unpack_from("<II", b, p)
                offs = struct.unpack_from(f"<{rank + 1}Q", b, p + 8)
                child = self._addr(p + key_size)
                if level > 0:
                    walk(child)
                else:
                    raw = bytes(self.mv[child:child + csize])
                    raw = self._apply_filters(raw, ds.filters, mask)
                    chunk = np.frombuffer(
                        raw, dt_np,
                        count=int(np.prod(cdims))).reshape(cdims)
                    sl_out, sl_in = [], []
                    for d in range(rank):
                        o0 = offs[d]
                        take = min(cdims[d], out.shape[d] - o0)
                        if take <= 0:
                            break
                        sl_out.append(slice(o0, o0 + take))
                        sl_in.append(slice(0, take))
                    else:
                        out[tuple(sl_out)] = chunk[tuple(sl_in)]
                p += key_size + self.so

        walk(node_addr)


class _FractalHeap:
    """Fractal-heap reader: managed objects in direct blocks (FHDB)
    reached through arbitrarily nested indirect blocks (FHIB) with
    the doubling-row size rule. Huge/tiny objects fail fast."""

    def __init__(self, f: "Hdf5File", addr: int):
        b = f.buf
        if b[addr:addr + 4] != b"FRHP":
            raise ValueError("bad fractal heap header")
        self.f = f
        so, sl = f.so, f.sl
        p = addr + 5
        (self.id_len,) = struct.unpack_from("<H", b, p)
        p += 2
        (self.iof_len,) = struct.unpack_from("<H", b, p)
        p += 2
        self.flags = b[p]
        p += 1
        (self.max_managed,) = struct.unpack_from("<I", b, p)
        p += 4
        p += sl + so                        # next huge id, huge btree
        p += sl + so                        # free space, fs manager
        p += sl * 2                         # managed space, allocated
        p += sl                             # direct block iterator
        p += sl * 5                         # managed nobj, huge size,
        #                                     huge nobj, tiny size/nobj
        (self.width,) = struct.unpack_from("<H", b, p)
        p += 2
        self.start_block = f._len(p)
        p += sl
        self.max_direct = f._len(p)
        p += sl
        (self.max_heap_bits,) = struct.unpack_from("<H", b, p)
        p += 2
        p += 2                              # starting # of rows
        self.root_addr = f._addr(p)
        p += so
        (self.cur_rows,) = struct.unpack_from("<H", b, p)
        self.off_size = (self.max_heap_bits + 7) // 8
        self.len_size = max(1, (int(self.max_managed).bit_length() + 7)
                            // 8)
        # map heap offset → file position of each direct block's data
        self.blocks: list[tuple[int, int, int]] = []
        if self.root_addr != _UNDEF:
            if self.cur_rows == 0:
                self._add_direct(self.root_addr, self.start_block)
            else:
                self._walk_indirect(self.root_addr, self.cur_rows)
        self.blocks.sort()

    def _row_size(self, row: int) -> int:
        return self.start_block if row < 2 \
            else self.start_block << (row - 1)

    def _add_direct(self, addr: int, size: int):
        b = self.f.buf
        if b[addr:addr + 4] != b"FHDB":
            raise ValueError("bad fractal heap direct block")
        p = addr + 5 + self.f.so
        blk_off = int.from_bytes(b[p:p + self.off_size], "little")
        # heap offsets count from the block START (header included):
        # file position of heap offset X in this block is
        # addr + (X - blk_off)
        self.blocks.append((blk_off, size, addr))

    def _walk_indirect(self, addr: int, nrows: int):
        b = self.f.buf
        if b[addr:addr + 4] != b"FHIB":
            raise ValueError("bad fractal heap indirect block")
        p = addr + 5 + self.f.so + self.off_size
        max_direct_rows = (int(self.max_direct).bit_length()
                           - int(self.start_block).bit_length()) + 2
        for row in range(nrows):
            size = self._row_size(row)
            for _ in range(self.width):
                child = self.f._addr(p)
                p += self.f.so
                if self.iof_len:
                    p += self.f.sl + 4      # filtered size + mask
                if child == _UNDEF:
                    continue
                if row < max_direct_rows:
                    self._add_direct(child, size)
                else:
                    # nested indirect block: an entry in row r covers
                    # row_size(r) bytes of heap space; a child with k
                    # rows covers width·start·2^(k-1), so
                    # k = r - log2(width) (H5HFiblock.c child nrows)
                    sub_rows = row - (int(self.width).bit_length() - 1)
                    self._walk_indirect(child, sub_rows)

    def locate(self, heap_id: bytes) -> int:
        """Managed heap ID → file position of the object bytes."""
        vt = heap_id[0]
        if (vt >> 4) & 0x3 != 0:
            raise ValueError("huge/tiny fractal heap objects unsupported")
        off = int.from_bytes(heap_id[1:1 + self.off_size], "little")
        for blk_off, bsize, baddr in self.blocks:
            if blk_off <= off < blk_off + bsize:
                return baddr + (off - blk_off)
        raise ValueError("fractal heap ID outside managed blocks")


def sniff_hdf5(buf: bytes) -> bool:
    if buf[:8] == _SIG:
        return True
    # the spec allows the superblock at 512 * 2^n
    pos = 512
    while pos + 8 <= len(buf) and pos <= (1 << 24):
        if buf[pos:pos + 8] == _SIG:
            return True
        pos <<= 1
    return False


def load_hdf5_bytes(path: str) -> bytes:
    """Read an HDF5 file from disk, stitching family-driver members
    (``name_0.h5``, ``name_1.h5``, …) back into one address space.
    The family VFD splits the file into fixed-size members in order,
    so concatenating members 0..N reconstructs the original file
    addresses (reference: gdal.Open('test_family_0.h5') via libhdf5's
    H5FD_FAMILY, autotest/gdrivers/hdf5.py test_hdf5_family_driver).
    Any member path opens the whole family."""
    import os
    import re

    m = re.match(r"(.*?)(\d+)(\.[^.]+)$", os.path.basename(path))
    if m:
        base, _, ext = m.groups()
        d = os.path.dirname(path) or "."
        member = lambda i: os.path.join(d, f"{base}{i}{ext}")  # noqa: E731
        if os.path.exists(member(0)) and os.path.exists(member(1)):
            parts = []
            i = 0
            while os.path.exists(member(i)):
                parts.append(open(member(i), "rb").read())
                i += 1
            return b"".join(parts)
    return open(path, "rb").read()


def decode_hdf5(buf: bytes, dataset: str | None = None):
    """HDF5 bytes → (pixels, geotransform|None, nodata|None, meta).
    ``dataset`` selects a path (the HDF5:"file"://path subdataset
    syntax); default picks the largest ≥2-D dataset, like the
    reference's HDF5Image heuristic."""
    f = Hdf5File(buf)
    dsets = f.datasets()
    if not dsets:
        raise ValueError("HDF5 file has no datasets")
    if dataset is not None:
        key = dataset if dataset.startswith("/") else "/" + dataset
        if key not in dsets:
            raise ValueError(f"dataset {dataset!r} not found "
                             f"(have {sorted(dsets)})")
    else:
        best = [p for p, o in dsets.items() if len(o.dataspace) >= 2]
        if not best:
            best = list(dsets)
        key = max(best, key=lambda p: int(np.prod(dsets[p].dataspace)))
    o = dsets[key]
    px = f.read(key)
    if px.ndim > 2 and not isinstance(px.dtype.fields, dict):
        px = px.reshape(-1, *px.shape[-2:]).transpose(1, 2, 0)
        if px.shape[2] == 1:
            px = px[:, :, 0]
    nodata = o.attrs.get("_FillValue")
    if isinstance(nodata, list):
        nodata = nodata[0]
    meta = {k: v for k, v in o.attrs.items() if v is not None}
    meta["hdf5_path"] = key
    gt, crs = _hdfeos_georef(f, key, px.shape)
    if crs:
        meta["crs"] = crs
    return px, gt, nodata, meta


def _dms_to_deg(v: float) -> float:
    """HDFEOS GCTP packed DMS (±DDDMMMSSS.ss) → decimal degrees."""
    sgn = -1.0 if v < 0 else 1.0
    v = abs(v)
    d = int(v // 1000000)
    m = int((v - d * 1000000) // 1000)
    s = v - d * 1000000 - m * 1000
    return sgn * (d + m / 60.0 + s / 3600.0)


def _hdfeos_georef(f: "Hdf5File", ds_path: str, shape):
    """HDF-EOS5 grid georeferencing: parse StructMetadata.0
    (frmts/hdf5/hdf5imagedataset.cpp grid handling) — UpperLeft/
    LowerRight corners + GCTP projection (GEO / UTM / sinusoidal)."""
    objs = f.visit()
    sm_path = next((p for p in objs
                    if p.endswith("StructMetadata.0")), None)
    if sm_path is None or "/HDFEOS/" not in ds_path:
        return None, None
    try:
        txt = f.read(sm_path).tobytes().split(b"\x00")[0].decode(
            "ascii", "replace")
    except Exception:
        return None, None
    import re as _re

    # locate the grid whose GridName appears in the dataset path
    grids = _re.split(r"GROUP=GRID_\d+", txt)[1:]
    block = None
    for g in grids:
        m = _re.search(r'GridName="([^"]+)"', g)
        if m and f"/GRIDS/{m.group(1)}/" in ds_path:
            block = g
            break
    if block is None and grids:
        block = grids[0]
    if block is None:
        return None, None

    def num2(name):
        m = _re.search(name + r"=\(([-\d.eE+]+),\s*([-\d.eE+]+)\)",
                       block)
        return (float(m.group(1)), float(m.group(2))) if m else None

    ul = num2("UpperLeftPointMtrs")
    lr = num2("LowerRightMtrs")
    mx = _re.search(r"XDim=(\d+)", block)
    my = _re.search(r"YDim=(\d+)", block)
    if not (ul and lr and mx and my):
        return None, None
    xdim, ydim = int(mx.group(1)), int(my.group(1))
    proj = (_re.search(r"Projection=HE5_GCTP_(\w+)", block) or
            [None, ""])[1] if _re.search(
                r"Projection=HE5_GCTP_(\w+)", block) else ""
    crs = None
    if proj == "GEO":
        ul = (_dms_to_deg(ul[0]), _dms_to_deg(ul[1]))
        lr = (_dms_to_deg(lr[0]), _dms_to_deg(lr[1]))
        crs = "EPSG:4326"
    elif proj == "UTM":
        mz = _re.search(r"ZoneCode=(-?\d+)", block)
        if mz:
            z = int(mz.group(1))
            crs = (f"+proj=utm +zone={abs(z)} +ellps=clrk66"
                   if int((_re.search(r"SphereCode=(\d+)", block)
                           or [None, "12"])[1]) == 0
                   else f"+proj=utm +zone={abs(z)}"
                   + (" +south" if z < 0 else "") + " +ellps=WGS84")
    elif proj == "SNSOID":
        crs = "+proj=sinu +R=6371007.181 +lon_0=0 +x_0=0 +y_0=0"
    gt = (ul[0], (lr[0] - ul[0]) / xdim, 0.0,
          ul[1], 0.0, (lr[1] - ul[1]) / ydim)
    return gt, crs
