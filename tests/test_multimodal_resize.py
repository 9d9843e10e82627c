from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.functions.multimodal import (
    documents_to_media,
    resize_media,
)
from market_pulse_data_pipeline_spark.sources.tables import load_table


def _media(spark, sf_dir):
    return documents_to_media(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    )


def test_resize_filters_audio_and_is_deterministic(spark, sf_dir):
    media = _media(spark, sf_dir)
    out1 = resize_media(media, 32, 32).orderBy("media_id").collect()
    out2 = resize_media(media, 32, 32).orderBy("media_id").collect()
    assert out1 == out2
    assert out1, "resize produced no rows"
    assert {r.media_type for r in out1} <= {"image", "video"}
    n_visual = media.filter(
        F.col("media_type").isin("image", "video")
    ).count()
    assert len(out1) == n_visual


def test_resize_output_depends_on_payload_and_target(spark, sf_dir):
    media = _media(spark, sf_dir)
    small = {r.media_id: r.resized_sha for r in resize_media(media, 16, 16).collect()}
    big = {r.media_id: r.resized_sha for r in resize_media(media, 32, 32).collect()}
    assert small.keys() == big.keys()
    # target dims change every output hash; distinct payloads give
    # distinct hashes at fixed dims
    assert all(small[k] != big[k] for k in small)
    assert len(set(small.values())) == len(small)
    row = resize_media(media, 32, 32).first()
    assert row.resized_len == (32 * 32) // 64
    assert row.width == 32 and row.height == 32


def test_resize_real_codec_guard(spark, sf_dir):
    import pytest

    media = _media(spark, sf_dir)
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; guard not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        resize_media(media, 32, 32, real=True)
