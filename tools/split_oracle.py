#!/usr/bin/env python3
"""One-shot refactoring script: split ExtOracle.scala into domain traits.

Reads src/main/scala/graft/analytics/ExtOracle.scala, carves it into
member blocks (each with its attached doc comment), assigns each member
to a domain trait, and writes:
  CoreOracle.scala SimilarityOracle.scala TextOracle.scala
  DedupOracle.scala SamplingOracle.scala ExtOracle.scala (aggregator)
Member text is preserved byte-for-byte; only `private` on the shared
cross-trait chains becomes `protected` (visibility widening is the one
semantic change, required for trait composition).
"""
import re, sys

SRC = "src/main/scala/graft/analytics/ExtOracle.scala"
lines = open(SRC).read().split("\n")

# --- find member starts (indent-2 val/def, incl. private/lazy) ---
mem_re = re.compile(r"^  (?:private(?:\[\w+\])? )?(?:lazy )?(?:val|def) ([A-Za-z0-9_]+)")
starts = []  # (lineno, name)
for i, l in enumerate(lines):
    m = mem_re.match(l)
    if m:
        starts.append((i, m.group(1)))

# attach preceding doc comment + blank lines to each member
def attach_start(idx):
    j = idx - 1
    # skip trailing blank lines upward? No: blanks belong to previous block.
    # walk up through a scaladoc block if it ends right above
    if j >= 0 and lines[j].rstrip().endswith("*/"):
        while j >= 0 and not lines[j].lstrip().startswith("/**"):
            j -= 1
        return j
    return idx

blocks = []  # (name, start, end)  [start, end)
for k, (i, name) in enumerate(starts):
    s = attach_start(i)
    e = attach_start(starts[k + 1][0]) if k + 1 < len(starts) else len(lines)
    blocks.append((name, s, e))

# header = lines before first block's start (package + object doc + decl)
hdr_end = blocks[0][1]

DOMAIN = {}
def dom(d, *names):
    for n in names: DOMAIN[n] = d

dom("core",
    "ord", "aggPricing", "revenueByNation", "topCustomers", "zorderScan",
    "datePartitionScan", "eventsHourly", "sessionizeBatch",
    "streamEventsHourly", "streamEventsSliding", "streamEventsEnriched",
    "asofLastPurchase", "rangeJoinCampaigns", "latestUserEvent",
    "streamDedupEvents", "streamSessionize", "streamAttribution",
    "streamDedupVsCorpus", "snapshotDiff", "referentialAudit",
    "streamQualityFilter", "profileEvents", "eventFunnel",
    "retentionCohorts", "userTopEvents", "saltedJoinRevenue",
    "multimodalFrames", "multimodalFeatures", "multimodalResize")
dom("text",
    "normalizeText", "curriculumOrder", "qualityTiers", "textStats",
    "bpeTokenCount", "bpeSep", "bpeLearnChain", "bpeMerges",
    "bpeApplyCount", "vocabSize", "tokenFreqTopK", "qualityScore",
    "piiScrub", "gopherRules", "repetitionScore", "stableRowIds",
    "lmQuality", "dsirWeights", "bigramLmInterp", "signalCorrelation",
    "spanCorruption", "dsirSelect", "tokenizerFertility",
    "contrastiveCrops", "bigramLmQuality", "bigramLmPruned",
    "langScores", "langIdCore", "langId", "chunkDocs",
    "featureHashVectors", "classifierScore", "tfidfTopTerms",
    "bm25TopK", "bm25Multiquery", "lengthBatches")
dom("dedup",
    "sourceScorecard", "decontaminate", "spanDupScore", "noveltyScore",
    "substringDedup", "dedupClusters", "c4Clean", "lineDedup",
    "boilerplateStrip", "dedupCorpus", "dedupExact", "containmentPairs",
    "ngramJaccard", "incrementalDedup", "fingerprintDocs",
    "minhashAgreeChain", "minhashPairsPortable", "minhashKeyedChain",
    "editdistVerify", "dedupScorecard", "dedupCorpusMinhash",
    "simhashPairsPortable")
dom("sampling",
    "bkt", "trainTestSplit", "stratifiedSample", "mixtureSample",
    "budgetMix", "packShards", "packingReport", "packSequences",
    "curated", "curationFunnel", "pretrainingCorpus",
    "leakageSafeSplit", "splitLeakageAudit", "splitLeakageAuditSafe",
    "kfoldSplit", "sourceCap", "shardManifest", "systematicSample")
dom("sim",
    "quantized", "quantized2", "kmeansChain", "kmeansAssign",
    "clusterBalancedSample", "annCosineTopK", "annBruteBatch",
    "matryoshkaTopK", "ivfCandChain", "ivfTopK", "hardNegatives",
    "pqChain", "sqChain", "sqEncode", "sqTopK", "pqEncode", "pqTopK",
    "ivfPqChain", "ivfPqTopK", "ivfPqRerank", "kcenterSample",
    "qualityPercentileFilter", "rpProject", "annLshTopK",
    "embeddingCentroids", "semanticDedup", "ivfPqResidual",
    "knnChain", "knnGraph", "knnLabelAccuracy", "knnPageRank",
    "nearDupEmbeddings")

missing = [n for (n, _, _) in blocks if n not in DOMAIN]
if missing:
    sys.exit(f"unmapped members: {missing}")

# members whose `private` must widen to `protected` for cross-trait use
WIDEN = {"ord", "minhashAgreeChain", "minhashKeyedChain", "langIdCore"}

out = {d: [] for d in ("core", "text", "dedup", "sampling", "sim")}
for name, s, e in blocks:
    body = lines[s:e]
    if name in WIDEN:
        body = [re.sub(r"^(  )private ", r"\1protected ", l, count=1)
                for l in body]
    out[DOMAIN[name]].append("\n".join(body).rstrip("\n"))

PKG = "package graft.analytics\n"

META = {
  "core": ("CoreOracle",
    "Reference-surface, analytics, streaming, as-of/range, layout and\n"
    "  * multimodal oracle twins (+ the shared deterministic ORDER BY\n"
    "  * helper)."),
  "text": ("TextOracle",
    "Text-analysis oracle twins: stats, quality, LM scoring, BPE,\n"
    "  * language ID, TF-IDF / BM25 retrieval, span corruption."),
  "dedup": ("DedupOracle",
    "Dedup-family oracle twins: exact / MinHash / SimHash / n-gram\n"
    "  * Jaccard tiers, decontamination, line/substring/boilerplate\n"
    "  * cleanup, and the shared MinHash pair/cluster chains."),
  "sampling": ("SamplingOracle",
    "Sampling / splitting / packing / curation oracle twins. Split\n"
    "  * and curation twins ride the MinHash cluster chain\n"
    "  * (DedupOracle) and the language-ID core (TextOracle)."),
  "sim": ("SimilarityOracle",
    "Embedding-similarity oracle twins: brute / LSH / IVF / SQ / PQ /\n"
    "  * IVF-PQ / residual ANN tiers, kNN graph family, k-means and\n"
    "  * coreset sampling."),
}
# extension (not self-types): protected access across traits is only
# guaranteed through an inheritance link in Scala 2, and trait-val
# initialization order then follows linearization (Core first,
# Sampling after Text/Dedup — the dependency direction).
EXT = {
  "text": "extends CoreOracle",           # uses ord (CoreOracle hosts it)
  "dedup": "extends CoreOracle",
  "sampling": "extends CoreOracle with TextOracle with DedupOracle",
  "sim": "extends CoreOracle",
}

for d, (tname, doc) in META.items():
    body = "\n\n".join(out[d])
    ext = EXT.get(d)
    open_l = f"trait {tname} " + (f"{ext} " if ext else "") + "{"
    txt = (f"{PKG}\n/** {doc}\n  *\n  * Carved out of the former monolithic"
           f" ExtOracle object (round 8);\n  * mixed back into `ExtOracle`,"
           f" whose name every gate entry keeps\n  * using. Parity rules in"
           f" the ExtOracle scaladoc. */\n{open_l}\n\n{body}\n}}\n")
    open(f"src/main/scala/graft/analytics/{tname}.scala", "w").write(txt)

agg = (PKG +
"""
/** DuckDB oracle twins for the shape queries (ShapeQueries) and the
  * oracle-expressible extension operators (TextAnalysis / Dedup /
  * Similarity / Sampling / Curation). One val per gate entry; the
  * definitions live in the domain traits (CoreOracle / TextOracle /
  * DedupOracle / SamplingOracle / SimilarityOracle — split by domain
  * in round 8 so the file is no longer the merge bottleneck), mixed
  * into this single object so every call site keeps the stable
  * `ExtOracle.<name>` address. Parity rules as in PinOracle plus:
  *  - integer-cents quantization `round(x*100)` for money/measure
  *    doubles (see ShapeQueries scaladoc for why this is
  *    engine-deterministic);
  *  - embedding math on `round(x*1000)` quantized values — integer-
  *    exact dot products (< 2^53, so even double accumulation is
  *    exact), cosine as the same a/(sqrt·sqrt) expression both sides.
  */
object ExtOracle extends CoreOracle with TextOracle with DedupOracle
    with SamplingOracle with SimilarityOracle
""")
open(SRC, "w").write(agg)
print("wrote", {d: len(out[d]) for d in out})
