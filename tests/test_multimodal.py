"""Multimodal stages: schema, determinism, actor plumbing, and the
real WAV / MJPEG-AVI decode backends."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages.multimodal import (AudioFeatures, VideoFrameSample,
                                        audio_dataset, make_audio_batch,
                                        make_video_batch, video_dataset)


class TestSources:
    def test_audio_schema_deterministic(self):
        a = make_audio_batch([0, 1, 2])
        b = make_audio_batch([0, 1, 2])
        assert a.equals(b)
        assert a.column_names == ["clip_id", "bytes", "sample_rate",
                                  "n_channels", "duration_ms"]

    def test_video_schema(self):
        v = make_video_batch([5])
        assert v.column_names == ["video_id", "bytes", "fps", "n_frames",
                                  "w", "h"]


class TestBackendValidation:
    def test_real_backends_construct(self):
        # backend="real" is no longer a stub: both actors bind this
        # package's own WAV / MJPEG-AVI codecs at __init__
        AudioFeatures(backend="real")
        VideoFrameSample(backend="real")


class TestAudioFeatures:
    def test_end_to_end(self, ray_session):
        out = audio_dataset(16).map_batches(
            AudioFeatures, fn_constructor_kwargs={"backend": "fake"},
            concurrency=2, batch_size=8, batch_format="pyarrow").to_pandas()
        assert len(out) == 16
        assert set(out.columns) == {"clip_id", "rms", "zcr",
                                    "spectral_centroid"}
        assert (out["rms"] > 0).all()
        assert out["clip_id"].is_unique

    def test_deterministic(self, ray_session):
        a = audio_dataset(6).map_batches(
            AudioFeatures, fn_constructor_kwargs={"backend": "fake"},
            concurrency=2, batch_format="pyarrow").to_pandas() \
            .sort_values("clip_id").reset_index(drop=True)
        b = audio_dataset(6).map_batches(
            AudioFeatures, fn_constructor_kwargs={"backend": "fake"},
            concurrency=2, batch_format="pyarrow").to_pandas() \
            .sort_values("clip_id").reset_index(drop=True)
        assert np.allclose(a["rms"], b["rms"])


class TestVideoFrames:
    def test_flatmap_layout(self, ray_session):
        out = video_dataset(8).map_batches(
            VideoFrameSample,
            fn_constructor_kwargs={"backend": "fake", "stride_s": 1.0},
            concurrency=2, batch_size=4, batch_format="pyarrow").to_pandas()
        assert set(out.columns) == {"video_id", "frame_index", "t_sec", "png"}
        # every video contributed >=1 frame; frame 0 always present
        g = out.groupby("video_id")["frame_index"].min()
        assert (g == 0).all()
        assert len(g) == 8

    def test_frames_decode_as_png(self, ray_session):
        from gdal_ray.codecs import decode
        out = video_dataset(2).map_batches(
            VideoFrameSample, fn_constructor_kwargs={"backend": "fake"},
            concurrency=1, batch_format="pyarrow").to_pandas()
        px = decode(out["png"].iloc[0], "png")
        assert px.ndim == 3 and px.shape[2] == 3


class TestWavCodec:
    def test_roundtrip_bit_depths(self):
        from gdal_ray.codecs.wav import decode_wav, encode_wav
        rng = np.random.default_rng(5)
        pcm = rng.uniform(-0.9, 0.9, (1000, 2))
        for bits, tol in ((8, 1 / 128), (16, 1 / 32768), (24, 1 / (1 << 23)),
                          (32, 1 / (1 << 31)), (-32, 1e-7)):
            out, sr = decode_wav(encode_wav(pcm, 22050, bits))
            assert sr == 22050 and out.shape == (1000, 2)
            assert np.abs(out - pcm).max() <= tol

    def test_int16_bit_exact(self):
        from gdal_ray.codecs.wav import decode_wav, encode_wav
        rng = np.random.default_rng(6)
        q = np.round(rng.uniform(-1, 1, 500) * 32767) / 32768.0
        out, _ = decode_wav(encode_wav(q, 8000, 16))
        assert np.array_equal(out[:, 0], q)

    def test_tolerates_extra_chunks(self):
        import struct
        from gdal_ray.codecs.wav import decode_wav, encode_wav
        buf = encode_wav(np.zeros(100), 8000, 16)
        # splice a LIST chunk between fmt and data
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        di = buf.index(b"data")
        patched = buf[:di] + extra + buf[di:]
        patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
        out, sr = decode_wav(patched)
        assert out.shape == (100, 1) and sr == 8000

    def test_bad_input(self):
        from gdal_ray.codecs.wav import decode_wav
        with pytest.raises(ValueError):
            decode_wav(b"not a wav at all....")


class TestAviCodec:
    def test_mjpeg_roundtrip(self):
        from gdal_ray.codecs import jpeg
        from gdal_ray.codecs.avi import decode_avi, encode_avi_mjpeg
        rng = np.random.default_rng(7)
        px = [(rng.random((48, 64, 3)) * 255).astype(np.uint8)
              for _ in range(5)]
        payloads = [jpeg.encode(f, 90) for f in px]
        info = decode_avi(encode_avi_mjpeg(payloads, 12.5, 64, 48))
        assert info["frames"] == payloads          # container is lossless
        assert abs(info["fps"] - 12.5) < 1e-6
        assert (info["w"], info["h"], info["n_frames"]) == (64, 48, 5)
        assert info["codec"] == "MJPG"
        assert jpeg.decode(info["frames"][2]).shape == (48, 64, 3)

    def test_bad_input(self):
        from gdal_ray.codecs.avi import decode_avi
        with pytest.raises(ValueError):
            decode_avi(b"RIFFxxxxWAVE")


class TestRealBackends:
    def test_audio_features_real_sine(self):
        # full-period sine: rms = amp/sqrt(2) within quantization noise
        from gdal_ray.codecs.wav import encode_wav
        from gdal_ray.stages.multimodal import AudioFeatures
        sr, f, amp, n = 8000, 200, 0.5, 8000
        t = np.arange(n) / sr
        wavb = encode_wav(amp * np.sin(2 * np.pi * f * t), sr, 16)
        batch = pa.table({
            "clip_id": pa.array(["c0"]), "bytes": pa.array([wavb],
                                                           pa.binary()),
            "sample_rate": pa.array([sr], pa.int32()),
            "n_channels": pa.array([1], pa.int32()),
            "duration_ms": pa.array([1000], pa.int32())})
        out = AudioFeatures(backend="real")(batch)
        rms = out["rms"][0].as_py()
        assert abs(rms - amp / np.sqrt(2)) < 1e-4
        # 200 Hz over 1 s crosses zero 400 times
        assert abs(out["zcr"][0].as_py() * (n - 1) - 400) <= 2

    def test_wav_stats_matches_closed_form(self):
        from gdal_ray.stages.multimodal import WavStats, make_wav_audio_batch
        batch = make_wav_audio_batch(range(10))
        out = WavStats()(batch)
        for j in range(10):
            i = j
            n = 800 + (i % 5) * 400
            s = np.arange(n, dtype=np.int64)
            v = ((s * (3 + i % 17) + i % 101) % 4001) - 2000
            assert out["n_samples"][j].as_py() == n
            assert out["sum_sq"][j].as_py() == int((v * v).sum())
            assert out["crossings"][j].as_py() == \
                int(np.sum((v[1:] < 0) != (v[:-1] < 0)))

    def test_video_real_sampling(self):
        from gdal_ray.codecs import decode
        from gdal_ray.stages.multimodal import (VideoFrameSample,
                                                make_avi_video_batch)
        batch = make_avi_video_batch(range(4))
        out = VideoFrameSample(backend="real", stride_s=1.0)(batch)
        # 4 fps, stride 1 s -> every 4th frame, frame 0 always sampled
        df = out.to_pandas()
        assert (df.groupby("video_id")["frame_index"].min() == 0).all()
        assert set(df["frame_index"]) <= {0, 4, 8}
        px = decode(df["png"].iloc[0], "png")
        assert px.shape == (32, 32, 3)
        # gradient frame content survived the real MJPEG decode
        assert px[0, 0, 0] < px[-1, -1, 0]

    def test_unknown_backend_rejected(self):
        from gdal_ray.stages.multimodal import (AudioFeatures,
                                                VideoFrameSample)
        with pytest.raises(ValueError):
            AudioFeatures(backend="nope")
        with pytest.raises(ValueError):
            VideoFrameSample(backend="nope")
