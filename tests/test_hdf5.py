"""HDF5 reader (codecs/hdf5.py) — reference-fixture goldens.

Reference expectations: autotest/gdrivers/hdf5.py (u8be checksum 135,
groups.h5 //MyGroup/dset1 checksum 18) and netCDF-4 parity with the
classic-model goldens (trmm.nc == trmm-nc4.nc == trmm-nc4c.nc)."""

import numpy as np
import pytest

from gdal_ray.codecs.hdf5 import Hdf5File, decode_hdf5
from gdal_ray.core.checksum import checksum

H5 = "/root/reference/autotest/gdrivers/data/hdf5"
NC = "/root/reference/autotest/gdrivers/data/netcdf"


def cs(a):
    return int(checksum(np.asarray(a, np.float64)))


class TestReferenceGoldens:
    def test_u8be_checksum_135(self):
        """autotest/gdrivers/hdf5.py:76 — big-endian uint8 dataset."""
        px, gt, nd, meta = decode_hdf5(open(f"{H5}/u8be.h5", "rb").read())
        assert px.shape == (6, 5)
        assert cs(px) == 135
        assert nd is None

    def test_groups_subdataset_checksum_18(self):
        """autotest/gdrivers/hdf5.py:108 — nested old-style groups,
        HDF5:"file"://MyGroup/dset1 subdataset access."""
        buf = open(f"{H5}/groups.h5", "rb").read()
        f = Hdf5File(buf)
        assert sorted(f.datasets()) == ["/MyGroup/Group_A/dset2",
                                        "/MyGroup/dset1"]
        assert cs(f.read("/MyGroup/dset1")) == 18
        px, *_ = decode_hdf5(buf, dataset="MyGroup/dset1")
        assert cs(px) == 18

    def test_deflate_shuffle_chunked(self):
        """deflate.h5: chunked + shuffle + deflate pipeline; content is
        the byte.tif raster (checksum 4672, stored bottom-up)."""
        f = Hdf5File(open(f"{H5}/deflate.h5", "rb").read())
        o = f.datasets()["/Band1"]
        assert o.layout[0] == "chunked"
        assert [fid for fid, _ in o.filters] == [2, 1]   # shuffle+deflate
        band = f.read("/Band1")
        assert cs(band[::-1]) == 4672

    def test_float_endianness_parity(self):
        a = Hdf5File(open(f"{H5}/float32_little_endian.h5", "rb").read())
        b = Hdf5File(open(f"{H5}/float32_big_endian.h5", "rb").read())
        va = a.read("/test").astype(np.float64)
        vb = b.read("/test").astype(np.float64)
        np.testing.assert_array_equal(va, vb)

    def test_compound_complex(self):
        f = Hdf5File(open(f"{H5}/complex.h5", "rb").read())
        c = f.read("/f64")
        assert set(c.dtype.names) == {"r", "i"}
        assert c.shape == (5, 5)
        # values are a simple ramp (r == i in the fixture)
        np.testing.assert_array_equal(c["r"], c["i"])

    def test_metadata_attributes(self):
        f = Hdf5File(open(f"{H5}/metadata.h5", "rb").read())
        objs = f.visit()
        root = objs["/"]
        assert root.attrs, "root group attributes missing"


class TestFixtureSweep:
    def test_every_hdf5_fixture_decodes_or_names_its_boundary(self):
        """All HDF5-container fixtures in the reference tree either
        decode fully or raise a named ValueError (no crashes): the
        honest-fail-fast contract."""
        import glob
        ok, named = 0, 0
        paths = (glob.glob(f"{H5}/*.h5")
                 + glob.glob(f"{NC}/*.nc"))
        for p in sorted(paths):
            buf = open(p, "rb").read()
            if buf[:8] != b"\x89HDF\r\n\x1a\n":
                continue
            try:
                f = Hdf5File(buf)
                for k in list(f.datasets())[:3]:
                    f.read(k)
                ok += 1
            except ValueError:
                named += 1
        assert ok >= 55, (ok, named)
        assert named <= 8


class TestNetcdf4:
    @pytest.mark.parametrize("name", ["trmm-nc4.nc", "trmm-nc4c.nc",
                                      "trmm-nc4z.nc"])
    def test_parity_with_classic_model(self, name):
        """netCDF-4 and netCDF-4-classic decode pixel/geotransform/
        nodata-identical to the classic trmm.nc golden."""
        from gdal_ray.codecs.netcdf import decode_netcdf
        a, gta, nda, _ = decode_netcdf(open(f"{NC}/trmm.nc", "rb").read())
        b, gtb, ndb, meta = decode_netcdf(open(f"{NC}/{name}", "rb").read())
        np.testing.assert_array_equal(np.asarray(a, np.float64),
                                      np.asarray(b, np.float64))
        assert np.allclose(gta, gtb)
        assert nda == ndb

    def test_read_raster_routes_h5(self):
        from gdal_ray.sources.raster import read_raster
        px, gt, nd, meta = read_raster(f"{H5}/u8be.h5")
        assert cs(px) == 135
        assert meta["hdf5_path"] == "/TestArray"


class TestFailFast:
    def test_not_hdf5(self):
        with pytest.raises(ValueError, match="superblock"):
            Hdf5File(b"\x00" * 4096)

    def test_missing_dataset_named(self):
        with pytest.raises(ValueError, match="not found"):
            decode_hdf5(open(f"{H5}/groups.h5", "rb").read(),
                        dataset="nope")


class TestHdfeos:
    def test_utm_grid_georef(self):
        """HDF-EOS5 grid StructMetadata: UTM zone 11 corners
        reproduce byte.tif's geotransform exactly."""
        px, gt, nd, meta = decode_hdf5(
            open(f"{H5}/dummy_HDFEOS_with_utm_projection.h5",
                 "rb").read())
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert "utm +zone=11" in meta["crs"]

    def test_geo_grid_dms_unpack(self):
        """GEO projection corners arrive in packed GCTP DMS."""
        px, gt, nd, meta = decode_hdf5(
            open(f"{H5}/dummy_HDFEOS_with_geo_projection.h5",
                 "rb").read())
        assert meta["crs"] == "EPSG:4326"
        assert -118.0 < gt[0] < -117.0
        assert 33.0 < gt[3] < 34.0
        assert gt[1] > 0 and gt[5] < 0

    def test_sinusoidal_grid(self):
        px, gt, nd, meta = decode_hdf5(
            open(f"{H5}/dummy_HDFEOS_with_sinu_projection.h5",
                 "rb").read())
        assert meta["crs"].startswith("+proj=sinu")
        # the CRS constructor can build the transform end-to-end
        from gdal_ray.core.srs import crs_from
        crs = crs_from(meta["crs"])
        lon, lat = crs.xy_to_lonlat(gt[0], gt[3])
        assert -180 <= float(lon) <= 180 and -90 <= float(lat) <= 90


class TestVlenStrings:
    def test_vlstr_metadata_parity(self):
        """Variable-length string attributes resolve through the
        global heap; values must match the reference's test_hdf5_9
        expectations (autotest/gdrivers/hdf5.py:247-254)."""
        f = Hdf5File(open(f"{H5}/vlstr_metadata.h5", "rb").read())
        attrs = f.visit()["/TEST"].attrs
        assert attrs["BANDNAMES"] == "SAA"
        assert attrs["CODING"] == "0.6666666667 0.0000000000 TRUE"
        assert attrs["FLAGS"] == "255=noValue"
        assert attrs["MAPPING"] == (
            "Geographic Lat/Lon 0.5000000000 0.5000000000 "
            "27.3154761905 -5.0833333333 0.0029761905 0.0029761905 "
            "WGS84 Degrees")
        assert attrs["NOVALUE"] == "255"
        assert attrs["RANGE"] == "0 255 0 255"

    def test_vlen_string_dataset(self):
        """A contiguous vlen-string dataset decodes to an object
        array of str."""
        f = Hdf5File(open(f"{H5}/hdfeos_sample_swath.h5", "rb").read())
        a = f.read("/HDFEOS/SWATHS/Swath1/Data Fields/Test_string")
        assert a.shape == (10,)
        assert a.dtype == object
        assert all(isinstance(v, str) for v in a)


class TestLayoutV4:
    def test_swath_v4_layouts_decode(self):
        """hdfeos_sample_swath.h5 is an HDF5 1.10 file using data
        layout v4 with single-chunk and extensible-array chunk
        indexes; the reference expects Spectra as 20x40x15
        (autotest/gdrivers/hdf5.py test_hdf5_eos_swath_*)."""
        f = Hdf5File(open(f"{H5}/hdfeos_sample_swath.h5", "rb").read())
        ds = f.datasets()
        spectra = f.read("/HDFEOS/SWATHS/Swath1/Data Fields/Spectra")
        assert spectra.shape == (15, 40, 20)
        temp = f.read("/HDFEOS/SWATHS/Swath1/Data Fields/Temperature")
        assert temp.shape == (20, 10)
        lon = f.read(
            "/HDFEOS/SWATHS/Swath1/Geolocation Fields/Longitude")
        assert lon.shape == (20, 10)

    def test_extensible_array_chunk_index(self):
        """The Count dataset uses the extensible-array chunk index
        with two chunks; chunk 1 holds the sequence 1..20 (real chunk
        data, not fill — the file's second chunk payload is
        [0,0,1..10]: the 21.. sequence appears nowhere in the file,
        so the stored bytes are decoded verbatim)."""
        f = Hdf5File(open(f"{H5}/hdfeos_sample_swath.h5", "rb").read())
        a = f.read("/HDFEOS/SWATHS/Swath1/Data Fields/Count")
        assert a.shape == (32,)
        np.testing.assert_array_equal(a[:20], np.arange(1, 21))
        np.testing.assert_array_equal(a[20:], [0, 0] + list(range(1, 11)))


class TestFamilyFiles:
    def test_family_members_stitch(self):
        """test_family_0/1/2.h5 are family-VFD members; any member
        path opens the stitched file (reference
        test_hdf5_family_driver)."""
        from gdal_ray.codecs.hdf5 import load_hdf5_bytes
        f = Hdf5File(load_hdf5_bytes(f"{H5}/test_family_0.h5"))
        a = f.read("/chunked")
        assert a.shape == (1000, 1000)
        assert a.dtype == np.float32
        # member 1 resolves to the same family
        f2 = Hdf5File(load_hdf5_bytes(f"{H5}/test_family_1.h5"))
        assert f2.read("/chunked").shape == (1000, 1000)

    def test_non_family_numbered_file_unaffected(self, tmp_path):
        """A numbered filename with no member-0/member-1 siblings
        reads as a plain single file."""
        from gdal_ray.codecs.hdf5 import load_hdf5_bytes
        import shutil
        p = tmp_path / "solo_7.h5"
        shutil.copy(f"{H5}/u8be.h5", p)
        f = Hdf5File(load_hdf5_bytes(str(p)))
        assert cs(f.read("/TestArray")) == 135


class TestExtensibleArrayBlocks:
    """Crafted-byte extensible arrays that spill past the index-block
    elements into EADB data blocks and EASB super blocks — the layout
    large unlimited-dimension granules produce (H5EA geometry:
    super block u holds 2^(u/2) data blocks of min·2^((u+1)/2)
    elements; first 2·log2(sblk_min_dblk_ptrs) super blocks' data
    blocks are addressed from the index block)."""

    SO = SL = 8
    ELT, MAXB, IDX, DMIN, SPTR, PBITS = 8, 32, 4, 16, 4, 10

    def _build(self, nchunks):
        buf = bytearray(200_000)
        UNDEF = (1 << 64) - 1
        pos = [4096]                       # bump allocator

        def alloc(n):
            a = pos[0]
            pos[0] += n
            return a

        def put(a, data):
            buf[a:a + len(data)] = data

        addr_of = lambda i: 1000 + i       # chunk i -> address 1000+i
        # geometry
        first_idx = 2 * (self.SPTR.bit_length() - 1)          # 4
        nsblks = 1 + (self.MAXB - (self.DMIN.bit_length() - 1))

        def dblk(ne, base):
            """One data block with ne elements starting at chunk base;
            elements beyond nchunks left UNDEF."""
            a = alloc(6 + self.SO + 4 + ne * self.ELT)
            put(a, b"EADB\x00\x00")
            r = a + 6 + self.SO + 4
            for i in range(ne):
                ci = base + i
                v = addr_of(ci) if ci < nchunks else UNDEF
                put(r + i * self.ELT, v.to_bytes(8, "little"))
            return a

        # index block
        n_dblk_addrs = sum(1 << (u // 2) for u in range(first_idx))
        n_sblk_addrs = nsblks - first_idx
        ib = alloc(6 + self.SO + (self.IDX * self.ELT)
                   + (n_dblk_addrs + n_sblk_addrs) * self.SO)
        put(ib, b"EAIB\x00\x00")
        q = ib + 6 + self.SO
        for i in range(self.IDX):          # index-resident elements
            v = addr_of(i) if i < nchunks else UNDEF
            put(q, v.to_bytes(8, "little"))
            q += self.ELT
        base = self.IDX
        for u in range(first_idx):         # direct data-block addrs
            ne = self.DMIN << ((u + 1) // 2)
            for _ in range(1 << (u // 2)):
                a = dblk(ne, base) if base < nchunks else UNDEF
                put(q, a.to_bytes(8, "little"))
                q += self.SO
                base += ne
        for u in range(first_idx, nsblks):  # super blocks
            ndblks = 1 << (u // 2)
            ne = self.DMIN << ((u + 1) // 2)
            if base < nchunks:
                sb = alloc(6 + self.SO + 4 + ndblks * self.SO)
                put(sb, b"EASB\x00\x00")
                r = sb + 6 + self.SO + 4
                for i in range(ndblks):
                    a = dblk(ne, base) if base < nchunks else UNDEF
                    put(r + i * self.SO, a.to_bytes(8, "little"))
                    base += ne
            else:
                sb = UNDEF
                base += ndblks * ne
            put(q, sb.to_bytes(8, "little"))
            q += self.SO
        # header
        hd = alloc(12 + 6 * self.SL + self.SO)
        put(hd, b"EAHD\x00\x00" + bytes([self.ELT, self.MAXB, self.IDX,
                                         self.DMIN, self.SPTR,
                                         self.PBITS]))
        put(hd + 12 + 6 * self.SL, ib.to_bytes(8, "little"))
        f = object.__new__(Hdf5File)
        f.buf = bytes(buf)
        f.so, f.sl = self.SO, self.SL
        return f, hd

    @pytest.mark.parametrize("nchunks", [3, 4, 7, 64, 244, 260, 900])
    def test_entries_in_order(self, nchunks):
        f, hd = self._build(nchunks)
        entries = Hdf5File._ext_array_entries(f, hd, nchunks)
        assert len(entries) == nchunks
        assert [e[0] for e in entries] == [1000 + i
                                           for i in range(nchunks)]
        assert all(e[1] == 0 and e[2] is None for e in entries)


class TestBtree2Depth2:
    """Crafted-byte v2 B-tree of depth 2 — the shape a dataset with
    tens of thousands of chunks (or a group with that many links)
    produces. Geometry per H5B2hdr.c: node_size 64 / rec_size 8 gives
    leaf max 6, depth-1 max 2, depth-2 max 2."""

    def test_depth2_walk(self):
        SO = 8
        node_size, rec_size = 64, 8
        buf = bytearray(100_000)
        pos = [4096]

        def alloc(n):
            a = pos[0]
            pos[0] += n
            return a

        def put(a, data):
            buf[a:a + len(data)] = data

        recs = [i.to_bytes(8, "little") for i in range(17)]
        it = iter(recs)

        def leaf(n):
            a = alloc(6 + n * rec_size + 4)
            put(a, b"BTLF\x00\x00")
            for i in range(n):
                put(a + 6 + i * rec_size, next(it))
            return a, n

        def internal(n, children, depth):
            # child ptr: addr + nrec(1 byte) [+ cum total(1) if d>1]
            a = alloc(6 + n * rec_size
                      + (n + 1) * (SO + 1 + (1 if depth > 1 else 0)) + 4)
            put(a, b"BTIN\x00\x00")
            q = a + 6
            for i in range(n):
                put(q, next(it))
                q += rec_size
            for caddr, cn in children:
                put(q, caddr.to_bytes(SO, "little"))
                q += SO
                put(q, bytes([cn]))
                q += 1
                if depth > 1:
                    put(q, b"\x00")       # subtree total (unused)
                    q += 1
            return a, n

        # bottom-up: 2 depth-1 nodes, each 2 records + 3 leaves of 2
        d1 = []
        for _ in range(2):
            lv = [leaf(2) for _ in range(3)]
            # records come FIRST in node layout but the walker emits
            # node records then children; order-insensitive assert
            d1.append(internal(2, lv, 1))
        root, root_n = internal(1, d1, 2)

        hd = alloc(16 + SO + 2)
        put(hd, b"BTHD\x00\x00")
        put(hd + 6, node_size.to_bytes(4, "little"))
        put(hd + 10, rec_size.to_bytes(2, "little"))
        put(hd + 12, (2).to_bytes(2, "little"))       # depth
        put(hd + 16, root.to_bytes(SO, "little"))
        put(hd + 16 + SO, root_n.to_bytes(2, "little"))

        f = object.__new__(Hdf5File)
        f.buf = bytes(buf)
        f.so, f.sl = SO, 8
        got = Hdf5File._btree2_records(f, hd)
        assert sorted(got) == sorted(recs)


class TestFractalHeapNestedIndirect:
    """Crafted fractal heap whose root indirect block has rows past
    max_direct_rows — those entries point to NESTED indirect blocks
    (the shape a group with very many dense links produces). Child
    nrows = row - log2(width) (H5HFiblock.c)."""

    def test_nested_indirect_locate(self):
        from gdal_ray.codecs.hdf5 import _FractalHeap
        SO = SL = 8
        START, MAXD, WIDTH, HEAP_BITS = 16, 32, 4, 16
        OFFS = (HEAP_BITS + 7) // 8            # 2
        buf = bytearray(200_000)
        pos = [4096]

        def alloc(n):
            a = pos[0]
            pos[0] += n
            return a

        def put(a, data):
            buf[a:a + len(data)] = data

        def direct(blk_off, size):
            a = alloc(size)
            put(a, b"FHDB\x00")
            put(a + 5 + SO, blk_off.to_bytes(OFFS, "little"))
            # payload marker at the block's last byte
            put(a + size - 1, bytes([blk_off // 16 % 251]))
            return a

        # rows: 0,1 -> 16B, 2 -> 32B, 3 -> 64B (indirect: max_direct
        # rows = log2(32)-log2(16)+2 = 3)
        def row_size(r):
            return START if r < 2 else START << (r - 1)

        def indirect(nrows, heap_base):
            entries = []
            off = heap_base
            for r in range(nrows):
                for _ in range(WIDTH):
                    if r < 3:
                        entries.append(direct(off, row_size(r)))
                    else:
                        sub_rows = r - 2       # log2(width)=2
                        entries.append(indirect(sub_rows, off))
                    off += row_size(r)
            a = alloc(5 + SO + OFFS + len(entries) * SO + 4)
            put(a, b"FHIB\x00")
            q = a + 5 + SO + OFFS
            for e in entries:
                put(q, e.to_bytes(SO, "little"))
                q += SO
            return a

        root = indirect(4, 0)                  # rows 0-3; row 3 nested
        hd = alloc(200)
        put(hd, b"FRHP\x00")
        p = hd + 5
        put(p, (4).to_bytes(2, "little")); p += 2          # id_len
        put(p, (0).to_bytes(2, "little")); p += 2          # iof_len
        p += 1                                             # flags
        put(p, (100).to_bytes(4, "little")); p += 4        # max managed
        p += SL + SO + SL + SO + 2 * SL + SL + 5 * SL
        put(p, WIDTH.to_bytes(2, "little")); p += 2
        put(p, START.to_bytes(SL, "little")); p += SL
        put(p, MAXD.to_bytes(SL, "little")); p += SL
        put(p, HEAP_BITS.to_bytes(2, "little")); p += 2
        p += 2                                             # start rows
        put(p, root.to_bytes(SO, "little")); p += SO
        put(p, (4).to_bytes(2, "little"))                  # cur rows

        f = object.__new__(Hdf5File)
        f.buf = bytes(buf)
        f.so, f.sl = SO, SL
        h = _FractalHeap(f, hd)
        # the nested row-3 blocks cover heap offsets 256..512; locate
        # an object at the last byte of each nested direct block
        for blk_off in range(256, 512, 16):
            # the marker byte sits at the last byte of each block
            fpos = h.locate(bytes([0]) + (blk_off + 15).to_bytes(
                OFFS, "little") + b"\x00")
            assert buf[fpos] == (blk_off // 16) % 251
            base = h.locate(bytes([0]) + blk_off.to_bytes(
                OFFS, "little") + b"\x00")
            assert buf[base + 15] == (blk_off // 16) % 251


class TestChunkedVlen:
    """Crafted chunked vlen-string dataset: descriptors (count +
    GCOL addr + index) live in v1-B-tree chunks, strings in the
    global heap — the layout netCDF-4 string variables with chunking
    produce."""

    def test_chunked_vlen_strings(self):
        SO = SL = 8
        buf = bytearray(65536)

        def put(a, d):
            buf[a:a + len(d)] = d

        g = 1024                              # GCOL
        put(g, b"GCOL\x01\x00\x00\x00")
        put(g + 8, (4096).to_bytes(SL, "little"))
        p = g + 8 + SL
        objs = [b"alpha", b"bravo!", b"x", b"longer string"]
        for i, o in enumerate(objs, 1):
            put(p, i.to_bytes(2, "little"))
            put(p + 2, (1).to_bytes(2, "little"))
            put(p + 8, len(o).to_bytes(SL, "little"))
            put(p + 8 + SL, o)
            p += 8 + SL + (len(o) + 7) // 8 * 8

        def desc(cnt, idx):
            return (cnt.to_bytes(4, "little")
                    + g.to_bytes(SO, "little")
                    + idx.to_bytes(4, "little"))

        c0, c1 = 8192, 8192 + 64              # two chunks of 2 elems
        put(c0, desc(5, 1) + desc(6, 2))
        put(c1, desc(1, 3) + desc(13, 4))

        t = 16384                             # v1 B-tree leaf, rank 1
        put(t, b"TREE" + bytes([1, 0]))
        put(t + 6, (2).to_bytes(2, "little"))
        p = t + 8 + 2 * SO
        for addr, off in ((c0, 0), (c1, 2)):
            put(p, (32).to_bytes(4, "little"))        # chunk bytes
            put(p + 4, (0).to_bytes(4, "little"))     # filter mask
            put(p + 8, off.to_bytes(8, "little"))     # elem offset
            put(p + 16, (0).to_bytes(8, "little"))    # elem-size dim
            put(p + 24, addr.to_bytes(SO, "little"))
            p += 32

        f = object.__new__(Hdf5File)
        f.buf = bytes(buf)
        f.mv = memoryview(f.buf)
        f.so, f.sl = SO, SL
        f._gheaps = {}

        class DS:
            layout = ("chunked", t, (2,), 16)
            filters = []
            fillvalue = None

        out = Hdf5File._read_vlen(f, DS(), (4,),
                                  ("vlen", "string", None))
        assert list(out) == ["alpha", "bravo!", "x", "longer string"]
