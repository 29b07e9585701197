package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.prepare(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $name run$i n=$n sec=${(System.nanoTime()-t0)/1e9}%.2f")
      }
    }
    // words only
    val ws = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
    time("tokenize")(ws.select(sum(size(col("ws")))).head().getLong(0))
    // shingles (string)
    val sh = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"), graft.ext.Dedup.shinglesFromWords(col("ws")).as("sh"))
    time("shingles")(sh.select(sum(size(col("sh")))).head().getLong(0))
    // shingles + hash + explode
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    time("shingle+explode+hash")(ex.select(count(col("h"))).head().getLong(0))
    // minhash sigs
    val sigs = sh.select(col("doc_id"), graft.ext.Dedup.shingleHashes(col("sh")).as("hs"))
      .select(col("doc_id"), graft.ext.Dedup.minhashSignature(col("hs"), 32).as("sig"))
    time("minhash_sigs")(sigs.select(sum(size(col("sig")))).head().getLong(0))
    spark.stop()
  }
}
