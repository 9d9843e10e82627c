"""Byte-identity pins for generator-produced oracle SQL.

Several registered oracles are emitted by shared generators —
functions/clustering.py::kmeans_oracle_sql (kmeans x2, IVF, SemDeDup),
pq_oracle_sql (PQ encode + ADC), pca_oracle_sql, and
functions/bpe.py::bpe_oracle_sql. A refactor of one generator can
silently shift many oracle strings at once (seen in round 6 with the
``src`` parameter addition, which was only session-verified — VERDICT
round-6 residual note). These sha256 pins make any drift a loud,
attributable failure: a deliberate generator change must re-pin the
hashes in the same commit, and the full value-hash oracle gate
(tools/check_oracle.py) must be re-run on every consumer listed here.
"""

import hashlib

from market_pulse_data_pipeline_spark.queries import QUERY_REGISTRY

GENERATOR_ORACLE_SHA256 = {
    # kmeans_oracle_sql consumers
    "embedding_kmeans_clusters":
        "e974421611c5bddc4e048bb5350657b827bef7d856568828cead78f162da486d",
    "embedding_kmeans_sizes":
        "7a00736909674d90abe24e0d7b24ce8bd86716bd6eb0769cd749fd8a3a6ff1f8",
    "ann_ivf_topk":
        "371438025e3e1deb4fd56f042e083d9f068fc5bb0a431ab11c6585ec35a8de0a",
    "semdedup_prune":
        "97d4f358d28013e611c53e42dec21feeac1cb0a23efd68351de41373dddff376",
    # pq_oracle_sql consumers (one kmeans chain per subspace)
    "pq_encode_embeddings":
        "14243824e40f112b47ed5a3e432f7db45ada2af60cc553db19bb285027097353",
    "ann_pq_adc_topk":
        "a4530dc98dc076937199e5a54c5c64e5afcfc5788c842b3ecaa1aeee1daf3a72",
    # pca_oracle_sql / bpe_oracle_sql
    "embedding_pca_project":
        "52aa7f0ae665933ca1af00f257ddfdd2c95c9dcf8a895171bd494c88af4acce7",
    "bpe_learned_merges":
        "9bc2b7718395f7041be3933793baa497a5ac27e4b9684107bbaf655a207a6523",
    "bpe_encode_corpus":
        "49a89170c31a626b441ee33ac86d051d21c5347fe374ee2624e8ea36842b0aef",
    "bpe_fertility_by_lang":
        "4d0024e8acef9c4ddd06140026f69d3c4c3a439ee48b41ff08a67b66681b4fe1",
}


def test_generator_oracles_are_byte_identical():
    got = {
        n: hashlib.sha256(QUERY_REGISTRY[n].oracle.encode()).hexdigest()
        for n in GENERATOR_ORACLE_SHA256
    }
    assert got == GENERATOR_ORACLE_SHA256
