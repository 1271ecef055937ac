"""Round-12 property pins.

1. Tokenizer whitespace-edge alignment (the r11 review's latent find,
   r11 verdict item 3): ``functions/text.tokens`` now extracts ``\\S+``
   runs, which (a) is BIT-IDENTICAL to the old trim-then-split idiom on
   every driver corpus document (the equality sweep below is the
   evidence bridge for the token-family gates whose driver re-pin
   rotates on the normal horizon rather than holding an r12 head slot),
   and (b) diverges from the old idiom EXACTLY on the adversarial
   whitespace-padded inputs where the old idiom disagreed with the
   DuckDB oracle mirrors — pinned with hand-computed expectations.

2. Generation-versioned minhash/LSH index reads (r11 verdict item 5):
   the IVF generation-directory pattern applied to the persisted
   minhash and LSH-bucket indexes — a reader that resolved before a
   nightly rebuild keeps answering from its generation bit-identically
   (tests mirror test_ivf_reader_during_swap_pins_old_generation).
"""

from __future__ import annotations

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def _old_tokens(col: str = "text") -> F.Column:
    """The pre-r12 trim-then-split idiom, kept here verbatim as the
    equality-sweep reference (space-trim only — the seam under test)."""
    trimmed = F.trim(F.lower(F.col(col)))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def test_tokens_corpus_bit_identical_to_old_idiom(spark):
    """The alignment is a NO-OP on every driver corpus document (both
    test scale factors): the old and new token arrays are equal row for
    row.  This is the evidence bridge that lets the token-family gates
    not holding an r12 head slot keep their published driver rows: the
    diff cannot have changed their results on driver fixtures."""
    from distributed_graph_db_c_spark.functions.text import tokens

    for sf in ("sf0.001", "sf0.01"):
        docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        diff = (
            docs.select(tokens().alias("new"), _old_tokens().alias("old"))
            .filter(
                ~(F.col("new") == F.col("old"))
                | F.col("new").isNull()
                | F.col("old").isNull()
            )
            .count()
        )
        assert diff == 0, f"{sf}: {diff} documents tokenize differently"


def test_tokens_whitespace_edge_adversarial(spark):
    """Hand-computed expectations on the exact inputs the r11 review
    named: leading tab, trailing newline, all-whitespace, empty, and a
    non-breaking space (NOT \\s in either engine's default regex class —
    must stay inside a token)."""
    from distributed_graph_db_c_spark.functions.text import tokens

    rows = [
        ("\thello World",),
        ("hello world\n",),
        (" \t\n ",),
        ("",),
        ("a b",),
        ("one  two\tthree\nfour",),
    ]
    got = [
        r.t
        for r in spark.createDataFrame(rows, ["text"])
        .select(tokens().alias("t"))
        .collect()
    ]
    assert got == [
        ["hello", "world"],
        ["hello", "world"],
        [],
        [],
        ["a b"],
        ["one", "two", "three", "four"],
    ]
    # and the OLD idiom genuinely diverged on the padded inputs — the
    # seam was real, not hypothetical
    old = [
        r.t
        for r in spark.createDataFrame(rows, ["text"])
        .select(_old_tokens().alias("t"))
        .collect()
    ]
    assert old[0] == ["", "hello", "world"]
    assert old[1] == ["hello", "world", ""]


def test_tokens_matches_duckdb_filter_semantics_on_padded_corpus(spark):
    """Cross-engine differential on MANUFACTURED adversarial inputs: pad
    every sf0.001 document with the tab/newline variants the
    text_tokenizer_whitespace_edge gate uses and compare per-document
    token COUNTS against DuckDB's all-whitespace-filter idiom."""
    import duckdb

    from distributed_graph_db_c_spark.functions.text import token_count

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r.doc_id: (r.tp, r.pd)
        for r in docs.select(
            "doc_id",
            token_count(F.concat(F.lit("\t"), F.col("text"))).alias("tp"),
            token_count(F.concat(F.lit(" \t"), F.col("text"), F.lit("\n "))).alias(
                "pd"
            ),
        ).collect()
    }
    con = duckdb.connect()
    toks = r"len(list_filter(string_split_regex(lower({e}), '\s+'), x -> x <> ''))"
    want = {
        int(doc_id): (int(tp), int(pd))
        for doc_id, tp, pd in con.execute(
            f"""SELECT doc_id,
                       {toks.format(e="chr(9) || text")},
                       {toks.format(e="' ' || chr(9) || text || chr(10) || ' '")}
                FROM '{SF_DIR}/documents.parquet'"""
        ).fetchall()
    }
    assert got == want


# -- generation-versioned minhash/LSH index reads (r11 verdict item 5) ------


def _docs(spark, n=60, width=25):
    return spark.createDataFrame(
        [(i, " ".join(f"w{j + i}" for j in range(width))) for i in range(n)],
        "doc_id long, text string",
    )


def test_minhash_reader_during_rebuild_pins_old_generation(spark):
    """The race the layout closes (mirrors
    test_ivf_reader_during_swap_pins_old_generation): a reader that
    RESOLVED generation 1 keeps answering from it — bit-identically —
    while a nightly rebuild publishes generation 2 with different
    contents; a fresh reader resolves generation 2."""
    import uuid

    from distributed_graph_db_c_spark.operators.bucketing import (
        index_drop_all,
        index_generations,
    )
    from distributed_graph_db_c_spark.operators.dedup import (
        incremental_dedup_pairs,
        minhash_index_build,
    )

    docs = _docs(spark)
    old_half = docs.filter(F.col("doc_id") < 40)
    new = spark.createDataFrame(
        [(999, " ".join(f"w{j + 3}" for j in range(25)))],  # dup of doc 3
        "doc_id long, text string",
    )
    prefix = f"genpin_{uuid.uuid4().hex[:8]}"
    try:
        g1 = minhash_index_build(old_half, prefix)
        assert g1 == 1
        before = sorted(
            map(tuple, incremental_dedup_pairs(new, prefix, generation=g1).collect())
        )
        assert before  # the planted dup pairs with doc 3
        # nightly rebuild over a DIFFERENT corpus slice (doc 3 gone)
        g2 = minhash_index_build(docs.filter(F.col("doc_id") >= 40), prefix)
        assert g2 == 2 and index_generations(spark, prefix) == [1, 2]
        # the pinned reader still answers from generation 1, exactly
        pinned = sorted(
            map(tuple, incremental_dedup_pairs(new, prefix, generation=g1).collect())
        )
        assert pinned == before
        # a fresh (unpinned) reader resolves generation 2: doc 3 absent
        fresh = incremental_dedup_pairs(new, prefix).collect()
        assert not fresh
    finally:
        index_drop_all(spark, prefix, ("_bands", "_shingles"))


def test_minhash_vacuum_is_the_only_destroyer(spark):
    """Vacuum removes exactly the non-kept generations; a reader pinned
    to a vacuumed generation fails LOUDLY (resolve raises
    FileNotFoundError — never a silent fallback to another snapshot)."""
    import uuid

    import pytest

    from distributed_graph_db_c_spark.operators.bucketing import (
        index_drop_all,
        index_generations,
    )
    from distributed_graph_db_c_spark.operators.dedup import (
        incremental_dedup_pairs,
        minhash_index_build,
        minhash_index_vacuum,
    )

    docs = _docs(spark, n=40)
    prefix = f"genvac_{uuid.uuid4().hex[:8]}"
    try:
        minhash_index_build(docs.filter(F.col("doc_id") < 20), prefix)
        minhash_index_build(docs, prefix)
        assert minhash_index_vacuum(spark, prefix, keep_last=1) == [1]
        assert index_generations(spark, prefix) == [2]
        new = docs.filter(F.col("doc_id") >= 38)
        with pytest.raises(FileNotFoundError, match="generation 1"):
            incremental_dedup_pairs(new, prefix, generation=1)
        # the kept generation still reads
        assert incremental_dedup_pairs(new, prefix).count() >= 0
    finally:
        index_drop_all(spark, prefix, ("_bands", "_shingles"))


def test_lsh_reader_during_rebuild_pins_old_generation(spark):
    """The decontamination-index twin of the minhash pin: resolve g=1,
    rebuild to g=2 over a different train slice, and require the pinned
    read bit-identical to the pre-rebuild read while a fresh read binds
    g=2 (different meta => different candidate geometry is fine — the
    point is the PIN, not the contents)."""
    import uuid

    from distributed_graph_db_c_spark.operators.bucketing import (
        index_drop_all,
        index_generations,
    )
    from distributed_graph_db_c_spark.operators.similarity import (
        decontaminate_incremental,
        lsh_index_build,
    )
    from distributed_graph_db_c_spark.queries.dedup import (
        _GRADE_MULTIPROBE,
        _GRADE_THRESHOLD,
        _PLANT_ID_OFFSET,
        _grade_corpus,
    )

    corpus = _grade_corpus(spark, SF_DIR)
    ev = corpus.filter(F.col("vec_id") >= _PLANT_ID_OFFSET)
    tr = corpus.filter(F.col("vec_id") < _PLANT_ID_OFFSET)
    prefix = f"genlsh_{uuid.uuid4().hex[:8]}"
    try:
        g1 = lsh_index_build(
            tr, prefix, threshold=_GRADE_THRESHOLD, dim=64,
            vec_col="v", multiprobe=_GRADE_MULTIPROBE,
        )
        assert g1 == 1
        before = sorted(
            map(
                tuple,
                decontaminate_incremental(
                    ev, prefix, vec_col="v", generation=g1
                ).collect(),
            )
        )
        assert before
        # rebuild over HALF the train side: planted sources with odd
        # ids vanish from the index
        g2 = lsh_index_build(
            tr.filter(F.col("vec_id") % 2 == 0), prefix,
            threshold=_GRADE_THRESHOLD, dim=64,
            vec_col="v", multiprobe=_GRADE_MULTIPROBE,
        )
        assert g2 == 2 and index_generations(spark, prefix) == [1, 2]
        pinned = sorted(
            map(
                tuple,
                decontaminate_incremental(
                    ev, prefix, vec_col="v", generation=g1
                ).collect(),
            )
        )
        assert pinned == before
        fresh = sorted(
            map(tuple, decontaminate_incremental(ev, prefix, vec_col="v").collect())
        )
        assert {b for (_, b, _) in fresh} <= {
            r.vec_id for r in tr.filter(F.col("vec_id") % 2 == 0).select("vec_id").collect()
        }
    finally:
        index_drop_all(spark, prefix, ("_buckets", "_vectors", "_meta"))


# -- native compressed codecs (round 12: JPEG + FLAC without deps) -----------


def test_jpeg_codec_roundtrip_properties():
    """The in-repo baseline-JPEG pair: dims exact, smooth gradients
    roundtrip within lossy tolerance, output deterministic, corruption
    and unsupported shapes fail loudly (never a wrong-but-green
    image)."""
    import numpy as np
    import pytest

    from distributed_graph_db_c_spark.operators.jpeg_codec import (
        jpeg_decode,
        jpeg_encode,
    )
    from distributed_graph_db_c_spark.operators.multimodal import (
        _jpeg_gradient_rgb,
    )

    for doc_id in (0, 1, 12, 63, 299):
        rgb = _jpeg_gradient_rgb(doc_id)
        blob = jpeg_encode(rgb, quality=90)
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        dec = jpeg_decode(blob)
        assert dec.shape == rgb.shape and dec.dtype == np.uint8
        err = np.abs(dec.astype(float) - rgb.astype(float))
        assert err.mean() < 2.0 and err.max() <= 12, (doc_id, err.mean())
        assert jpeg_encode(rgb, quality=90) == blob  # deterministic
    with pytest.raises(NotImplementedError):
        jpeg_decode(b"\xff\xd8" + b"\x12" * 40)  # marker desync
    with pytest.raises(NotImplementedError):
        jpeg_encode(np.zeros((8, 8), dtype=np.uint8))  # not RGB


def test_flac_codec_roundtrip_and_crc():
    """The in-repo verbatim-FLAC pair: bit-exact roundtrip at native
    depth, CRC-16 catches payload corruption, CRC-8 catches header
    corruption, and prediction shapes name the soundfile tier."""
    import numpy as np
    import pytest

    from distributed_graph_db_c_spark.operators.flac_codec import (
        flac_decode,
        flac_encode,
    )

    samples = np.int16([100, -100, 32767, -32768] * 50)
    blob = flac_encode(samples, 44100)
    dec, rate, bps = flac_decode(blob)
    assert rate == 44100 and bps == 16
    assert (dec[:, 0] == samples.astype(np.int64)).all()
    corrupted = bytearray(blob)
    corrupted[-10] ^= 0xFF
    with pytest.raises(NotImplementedError, match="CRC"):
        flac_decode(bytes(corrupted))


def test_decode_audio_flac_matches_soundfile_convention():
    """decode_audio returns native-FLAC samples in soundfile's int32
    convention (16-bit << 16) so the native tier and the probe tier are
    numerically interchangeable; where soundfile is installed the two
    tiers are differentially pinned on the same blob."""
    import numpy as np

    from distributed_graph_db_c_spark.operators.multimodal import (
        decode_audio,
        soundfile_available,
        synth_flac_native,
        synth_wav,
    )

    for doc_id in (0, 3, 7):
        fl, fr = decode_audio(synth_flac_native(doc_id))
        wv, wr = decode_audio(synth_wav(doc_id))
        assert fr == wr
        assert (fl == (wv << 16)).all()
        if soundfile_available():  # cross-tier differential where possible
            import io

            import soundfile as sf

            data, rate = sf.read(
                io.BytesIO(synth_flac_native(doc_id)), dtype="int32", always_2d=True
            )
            assert rate == fr and (data.astype(np.int64) == fl).all()


def test_decode_image_jpeg_cross_tier_where_pillow_ships():
    """Where Pillow is installed, the native decoder and PIL must agree
    on the native encoder's output within JPEG IDCT rounding (both
    implement the same spec; tiny per-pixel differences are legal), and
    a PIL-ENCODED gradient must decode through the native tier within
    the same lossy tolerance vs the source."""
    import numpy as np
    import pytest

    from distributed_graph_db_c_spark.operators.multimodal import (
        _jpeg_gradient_rgb,
        pil_available,
        synth_jpeg_native,
    )

    if not pil_available():
        pytest.skip("Pillow absent: cross-tier differential not runnable here")
    import io

    from PIL import Image

    from distributed_graph_db_c_spark.operators.jpeg_codec import jpeg_decode

    for doc_id in (0, 12, 63):
        blob = synth_jpeg_native(doc_id)
        native = jpeg_decode(blob).astype(float)
        pil = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB")).astype(float)
        if doc_id % 3 == 0:  # 4:4:4 rotation: IDCT rounding only
            assert np.abs(native - pil).max() <= 2.0
        else:
            # subsampled rotations (round 13): libjpeg upsamples chroma
            # with triangular interpolation, this decoder with nearest —
            # both legal; agreement is bounded, not per-pixel-exact
            diff = np.abs(native - pil)
            assert diff.mean() < 3.0 and np.quantile(diff, 0.9) < 8.0
        src = _jpeg_gradient_rgb(doc_id)
        buf = io.BytesIO()
        Image.fromarray(src).save(buf, format="JPEG", quality=90)
        dec = jpeg_decode(buf.getvalue()).astype(float)
        assert np.abs(dec - src.astype(float)).mean() < 3.0


def test_dedup_index_time_travel_decomposition(spark):
    """Gate-level pin for dedup_index_time_travel: the generation-2 leg
    must equal the generation-1 leg restricted to the surviving old ids
    (%4 in (2,3)) — signatures depend only on a document's own text, so
    dropping indexed documents can only REMOVE pairs, never change a
    surviving pair's jaccard, and both legs must be non-vacuous."""
    from distributed_graph_db_c_spark.queries.dedup import dedup_index_time_travel

    rows = dedup_index_time_travel(spark, "/root/testdata/sf0.01").collect()
    g1 = {(r.old_id, r.new_id): round(r.jaccard, 9) for r in rows if r.generation == 1}
    g2 = {(r.old_id, r.new_id): round(r.jaccard, 9) for r in rows if r.generation == 2}
    assert g1 and g2
    expected_g2 = {k: v for k, v in g1.items() if k[0] % 4 in (2, 3)}
    assert g2 == expected_g2
    assert set(g2) < set(g1)  # the deletion genuinely removed matches
