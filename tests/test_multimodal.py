"""Multimodal stub stages: schema, determinism, actor plumbing."""

import numpy as np
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


class TestRealBackendFailsFast:
    def test_audio(self):
        with pytest.raises(NotImplementedError):
            AudioFeatures(backend="real")

    def test_video(self):
        with pytest.raises(NotImplementedError):
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
