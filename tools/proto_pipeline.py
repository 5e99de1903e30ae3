#!/usr/bin/env python3
"""Prototype of the §2c oracle SQL suite (dev-only).

Validates thresholds/band constants and runtimes in DuckDB before the
Scala port. The constant formulas here MUST match PipelineQueries.scala.
"""
import sys
import time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"

M = 1000000007          # polyhash modulus
P = 2147483647          # minhash modulus (2^31-1)
K = 16                  # minhash signature length
MH_BANDS = 4            # 4 bands x 4 rows
SH_BANDS = 4            # simhash: 4 bands x 8 bits
JACCARD_TAU = 0.5
HAMMING_TAU = 3
COS_TAU = 0.4
N_PLANES = 8            # embedding LSH: 2 bands x 4 planes
EMB_BANDS = 2
DIM = 64

mh_a = [((j + 1) * 2654435761) % P or 1 for j in range(K)]
mh_b = [((j + 1) * 1013904223) % P for j in range(K)]
planes = [[(((1103515245 * (p * DIM + i) + 12345) % 2001) - 1000) / 1000.0
           for i in range(DIM)] for p in range(N_PLANES)]

POLY = lambda s: (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
                  f"list_transform(string_split({s},''), ch -> CAST(ascii(ch) AS BIGINT))), "
                  f"(h, cp) -> (h*31+cp) % {M})")

SHINGLE_CTE = f"""
WITH ws AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents),
whs AS (
  SELECT doc_id, list_transform(w, s -> {POLY('s')}) AS wh FROM ws),
hs0 AS (
  SELECT doc_id,
         list_distinct([(((wh[i]*31 + wh[i+1]) % {M}) * 31 + wh[i+2]) % {M}
                        for i in generate_series(1, greatest(len(wh)-2, 0))]) AS hs
  FROM whs),
hashes AS (
  SELECT doc_id, hs, CAST(len(hs) AS BIGINT) AS n_sh FROM hs0)
"""

Q = {}

Q["dedup_exact"] = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY content_hash"""

Q["dedup_ngram_jaccard"] = SHINGLE_CTE + f"""
, ex AS (SELECT doc_id, n_sh, unnest(hs) AS h FROM hashes),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter,
         any_value(a.n_sh) AS na, any_value(b.n_sh) AS nb
  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE)/(na+nb-inter) AS jaccard
FROM pairs WHERE CAST(inter AS DOUBLE)/(na+nb-inter) >= {JACCARD_TAU}
ORDER BY doc_a, doc_b"""

mh_sig = ", ".join(
    f"list_min(list_transform(hs, h -> (h*{a}+{b}) % {P})) AS s{j}"
    for j, (a, b) in enumerate(zip(mh_a, mh_b)))
band_keys = ", ".join(
    "concat_ws(',', " + ", ".join(f"s{b*4+r}" for r in range(4)) + f") AS band{b}"
    for b in range(MH_BANDS))
Q["dedup_minhash"] = SHINGLE_CTE + f"""
, sig AS (SELECT doc_id, hs, {mh_sig} FROM hashes),
bands AS (SELECT doc_id, hs, {band_keys} FROM sig),
ex AS (SELECT doc_id, hs, band_id, band_val FROM bands
       UNPIVOT (band_val FOR band_id IN ({', '.join('band%d' % b for b in range(MH_BANDS))}))),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ex a JOIN ex b ON a.band_id = b.band_id AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id),
verify AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
           / (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))) AS jaccard
  FROM cand JOIN hashes ha ON ha.doc_id = doc_a
            JOIN hashes hb ON hb.doc_id = doc_b)
SELECT doc_a, doc_b, jaccard FROM verify WHERE jaccard >= {JACCARD_TAU}
ORDER BY doc_a, doc_b"""

simhash = " + ".join(
    f"(CASE WHEN 2*list_sum(list_transform(hs, h -> (h >> {i}) & 1)) > len(hs) "
    f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
    for i in range(32))
sh_band_keys = ", ".join(f"((sim >> {8*b}) & 255) AS band{b}" for b in range(SH_BANDS))
Q["dedup_simhash"] = SHINGLE_CTE + f"""
, sims AS (SELECT doc_id, {simhash} AS sim FROM hashes WHERE len(hs) > 0),
bands AS (SELECT doc_id, sim, {sh_band_keys} FROM sims),
ex AS (SELECT doc_id, sim, band_id, band_val FROM bands
       UNPIVOT (band_val FOR band_id IN ({', '.join('band%d' % b for b in range(SH_BANDS))}))),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         any_value(a.sim) AS sim_a, any_value(b.sim) AS sim_b
  FROM ex a JOIN ex b ON a.band_id = b.band_id AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b)) AS hamming
FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= {HAMMING_TAU}
ORDER BY doc_a, doc_b"""

NORM_CTE = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      [x*x for x in CAST(embedding AS DOUBLE[])]), (s,x) -> s+x)) AS nrm
  FROM embeddings)
"""
def dot(a, b):
    return (f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"[{a}[i]*{b}[i] for i in generate_series(1,{DIM})]), (s,x) -> s+x)")

def plane_lit(p):
    return "[" + ", ".join(f"CAST({c!r} AS DOUBLE)" for c in planes[p]) + "]"

# bucket per band: 4 sign bits from 4 planes
def bucket(band):
    bits = []
    for r in range(4):
        p = band * 4 + r
        bits.append(f"(CASE WHEN {dot('e', plane_lit(p))} >= 0 THEN {1 << r} ELSE 0 END)")
    return " + ".join(bits)

emb_buckets = ", ".join(f"({bucket(b)}) AS band{b}" for b in range(EMB_BANDS))
Q["dedup_embedding"] = NORM_CTE + f"""
, bk AS (SELECT vec_id, e, nrm, {emb_buckets} FROM v),
ex AS (SELECT vec_id, e, nrm, band_id, band_val FROM bk
       UNPIVOT (band_val FOR band_id IN ({', '.join('band%d' % b for b in range(EMB_BANDS))}))),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM ex a JOIN ex b ON a.band_id = b.band_id AND a.band_val = b.band_val
                      AND a.vec_id < b.vec_id),
verify AS (
  SELECT vec_a, vec_b, {dot('va.e', 'vb.e')} / (va.nrm * vb.nrm) AS cos
  FROM cand JOIN v va ON va.vec_id = vec_a JOIN v vb ON vb.vec_id = vec_b)
SELECT vec_a, vec_b, cos FROM verify WHERE cos >= {COS_TAU}
ORDER BY vec_a, vec_b"""

Q["sim_topk_bruteforce"] = NORM_CTE + f"""
, q AS (SELECT * FROM v WHERE vec_id < 8), c AS (SELECT * FROM v WHERE vec_id >= 8),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         {dot('q.e', 'c.e')} / (q.nrm * c.nrm) AS cos
  FROM q CROSS JOIN c),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id) AS rnk
  FROM scored)
SELECT query_id, corpus_id, cos, CAST(rnk AS INT) AS rnk FROM ranked WHERE rnk <= 10
ORDER BY query_id, rnk"""

Q["sim_topk_lsh"] = NORM_CTE + f"""
, bk AS (SELECT vec_id, e, nrm, {emb_buckets} FROM v),
q AS (SELECT * FROM bk WHERE vec_id < 8), c AS (SELECT * FROM bk WHERE vec_id >= 8),
ex_q AS (SELECT vec_id, e, nrm, band_id, band_val FROM q
         UNPIVOT (band_val FOR band_id IN ({', '.join('band%d' % b for b in range(EMB_BANDS))}))),
ex_c AS (SELECT vec_id, e, nrm, band_id, band_val FROM c
         UNPIVOT (band_val FOR band_id IN ({', '.join('band%d' % b for b in range(EMB_BANDS))}))),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id
  FROM ex_q q JOIN ex_c c ON q.band_id = c.band_id AND q.band_val = c.band_val),
scored AS (
  SELECT query_id, corpus_id, {dot('vq.e', 'vc.e')} / (vq.nrm * vc.nrm) AS cos
  FROM cand JOIN v vq ON vq.vec_id = query_id JOIN v vc ON vc.vec_id = corpus_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id) AS rnk
  FROM scored)
SELECT query_id, corpus_id, cos, CAST(rnk AS INT) AS rnk FROM ranked WHERE rnk <= 10
ORDER BY query_id, rnk"""

STOP = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "en", "es"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "est", "un", "que"],
    "zh": ["de", "shi", "bu", "le", "zai", "you", "he"],
}
hits = ", ".join(
    "len(list_filter(w, x -> list_contains([%s], x))) AS s_%s"
    % (", ".join(f"'{t}'" for t in STOP[l]), l) for l in ["en", "es", "de", "fr", "zh"])
Q["text_lang_id"] = f"""
WITH ws AS (
  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents),
scores AS (SELECT doc_id, lang, {hits} FROM ws)
SELECT doc_id, lang,
  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
       WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
       WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
       WHEN s_fr >= s_zh THEN 'fr'
       ELSE 'zh' END AS pred_lang,
  s_en, s_es, s_de, s_fr, s_zh
FROM scores ORDER BY doc_id"""

Q["text_quality"] = """
WITH ws AS (
  SELECT doc_id, text, length(text) AS n_chars,
         string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents),
m AS (
  SELECT doc_id, n_chars, len(w) AS n_words,
    len(list_distinct(w)) AS n_uniq,
    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(w, x -> CAST(length(x) AS BIGINT))),
                (s, x) -> s + x) AS word_chars,
    len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS stop_hits,
    length(regexp_replace(text, '[^a-z]', '', 'g')) AS alpha_chars
  FROM ws)
SELECT doc_id, n_chars, n_words, n_uniq,
  CAST(word_chars AS DOUBLE)/n_words AS avg_word_len,
  CAST(n_uniq AS DOUBLE)/n_words AS uniq_ratio,
  CAST(stop_hits AS DOUBLE)/n_words AS stop_ratio,
  CAST(alpha_chars AS DOUBLE)/n_chars AS alpha_ratio,
  0.3*(CAST(n_uniq AS DOUBLE)/n_words) + 0.3*(CAST(stop_hits AS DOUBLE)/n_words)
    + 0.4*(CAST(alpha_chars AS DOUBLE)/n_chars) AS quality
FROM m ORDER BY doc_id"""

Q["text_tokens"] = r"""
SELECT doc_id,
  len(string_split_regex(lower(trim(text)), '\s+')) AS n_ws_tokens,
  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_re_tokens,
  length(text) AS n_chars,
  CAST(length(text) AS DOUBLE)
    / len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS chars_per_token
FROM documents ORDER BY doc_id"""

Q["doc_fingerprint"] = f"""
SELECT doc_id, {POLY('text')} AS fingerprint,
  list_min([{POLY("substring(text, i, 8)")}
            for i in generate_series(1, greatest(length(text)-7, 1))]) AS min_gram_hash,
  length(text) AS n_chars
FROM documents ORDER BY doc_id"""

Q["mm_meta"] = f"""
WITH blobs AS (
  SELECT doc_id, encode(text) AS blob,
         CASE ((doc_id % 3)) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
         {POLY('text')} AS checksum, octet_length(encode(text)) AS size_bytes
  FROM documents)
SELECT doc_id, format, size_bytes, checksum,
  CAST(16 + checksum % 320 AS BIGINT) AS width,
  CAST(16 + (checksum // 320) % 200 AS BIGINT) AS height,
  CASE WHEN format = 'video' THEN CAST(1 + checksum % 16 AS BIGINT) ELSE NULL END AS n_frames,
  CASE WHEN format = 'audio' THEN CAST(8000 + (checksum % 4) * 8000 AS BIGINT) ELSE NULL END AS sample_rate
FROM blobs ORDER BY doc_id"""


def main():
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/{SF}/{t}.parquet'")
    for name, sql in Q.items():
        t0 = time.time()
        try:
            df = con.execute(sql).df()
            print(f"{name}: {len(df)} rows {time.time()-t0:.2f}s")
            print(df.head(4).to_string()[:400])
        except Exception as e:
            print(f"{name}: FAIL {e}")
        print()


if __name__ == "__main__":
    main()
