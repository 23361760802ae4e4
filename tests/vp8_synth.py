"""Synthetic VP8 keyframe stream writer: RFC 6386 §7.2 boolean
encoder + minimal frame headers. Test fixture generator for the own
VP8 decoder (gdal_ray/codecs/vp8.py) — emits all-skip keyframes with
chosen intra modes so every prediction path and bmode context row is
exercisable without an external encoder."""
import struct

class BoolEnc:
    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1

    def put(self, prob, bit):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, v, n):
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)

    def signed(self, v, n):
        self.literal(abs(v), n)
        self.put(128, 1 if v < 0 else 0)

    def maybe_signed(self, v, n):
        if v:
            self.put(128, 1)
            self.signed(v, n)
        else:
            self.put(128, 0)

    def tree(self, tree, probs, leaf):
        # encode symbol 'leaf' by walking the tree
        path = []

        def walk(i):
            for b in (0, 1):
                t = tree[i + b]
                if t <= 0:
                    if -t == leaf:
                        path.append((i >> 1, b))
                        return True
                else:
                    if walk(t):
                        path.append((i >> 1, b))
                        return True
            return False

        if not walk(0):
            raise ValueError("leaf not in tree")
        for pi, b in reversed(path):
            self.put(probs[pi], b)

    def stop(self):
        for _ in range(32):
            self.put(128, 0)
        return bytes(self.out)


KF_YMODE_TREE = (-4, 2, 4, 6, -0, -1, -2, -3)
KF_YMODE_PROB = (145, 156, 163, 128)
UV_TREE = (-0, 2, -1, 4, -2, -3)
KF_UV_PROB = (142, 114, 183)


def make_vp8(w, h, ymode=0, uvmode=0, y_ac_qi=0, filter_level=0,
             bmodes=None):
    """Single-segment all-skip keyframe: every MB is `ymode` (0=DC,
    1=V, 2=H, 3=TM, 4=B_PRED w/ bmodes grid) and `uvmode`, zero
    residuals everywhere."""
    mb_w, mb_h = (w + 15) >> 4, (h + 15) >> 4
    e = BoolEnc()
    e.put(128, 0)                      # color space
    e.put(128, 0)                      # clamping
    e.put(128, 0)                      # segmentation off
    e.put(128, 0)                      # filter type
    e.literal(filter_level, 6)
    e.literal(0, 3)                    # sharpness
    e.put(128, 0)                      # lf deltas off
    e.literal(0, 2)                    # 1 token partition
    e.literal(y_ac_qi, 7)
    for _ in range(5):
        e.put(128, 0)                  # no quant deltas
    e.put(128, 1)                      # refresh entropy
    from gdal_ray.codecs.vp8_tables import COEFF_UPDATE_PROBS
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for ll in range(11):
                    e.put(int(COEFF_UPDATE_PROBS[i, j, k, ll]), 0)
    e.put(128, 1)                      # mb_no_skip_coeff on
    e.literal(1, 8)                    # prob_skip_false = 1 (skip likely)
    from gdal_ray.codecs.vp8 import KF_BMODE_PROB
    above = [[0] * 4 for _ in range(mb_w)]
    BMODE_TREE = (-0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6,
                  -4, 14, -7, 16, -8, -9)
    M2B = {0: 0, 1: 2, 2: 3, 3: 1}
    for my in range(mb_h):
        left = [0] * 4
        for mx in range(mb_w):
            e.put(1, 1)                # skip = 1
            e.tree(KF_YMODE_TREE, KF_YMODE_PROB, ymode)
            if ymode == 4:
                grid = bmodes if bmodes is not None \
                    else [[0] * 4 for _ in range(4)]
                for sy in range(4):
                    for sx in range(4):
                        a = above[mx][sx] if sy == 0 else grid[sy - 1][sx]
                        l = left[sy] if sx == 0 else grid[sy][sx - 1]
                        e.tree(BMODE_TREE, KF_BMODE_PROB[a][l],
                               grid[sy][sx])
                above[mx] = list(grid[3])
                left = [grid[r][3] for r in range(4)]
            else:
                above[mx] = [M2B[ymode]] * 4
                left = [M2B[ymode]] * 4
            e.tree(UV_TREE, KF_UV_PROB, uvmode)
    part0 = e.stop()
    tag = (len(part0) << 5) | (1 << 4) | 0   # show_frame, keyframe
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF,
                 0x9D, 0x01, 0x2A]) \
        + struct.pack("<H", w) + struct.pack("<H", h)
    payload = hdr + part0 + b"\x00"    # empty token partition
    riff = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff
