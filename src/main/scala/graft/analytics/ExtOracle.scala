package graft.analytics

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
