package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Codec for the reference's adjacency-matrix text format and the
  * graph-store write path.
  *
  * Format (`Assignment2/primary_server.c:132-140` write,
  * `secondary_server.c:544-559` read):
  * {{{
  * N
  * a11 a12 … a1N     // N rows of N whitespace-separated 0/1 ints
  * }}}
  * `a(i)(j) = 1` ⇒ directed edge i→j. Vertices are 0-based internally
  * (1-based only in the reference's client I/O).
  *
  * The matrix format is header-dependent and capped at 100 vertices in the
  * reference (`MAX_VERTICES`, `secondary_server.c:30`), so fixture parsing
  * is a driver-side read — that is the honest design, not a scale
  * compromise: at scale graphs are stored as parquet edge tables
  * ([[GraphStore]]), and this codec exists only to ingest reference
  * fixtures.
  */
object AdjacencyCodec {

  /** Parse a G*.txt file into an edge DataFrame `(src: long, dst: long)`. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path).collect()
    val n = lines.headOption.map(_.trim).filter(_.nonEmpty).map(_.toInt).getOrElse(0)
    val edges = for {
      (line, i) <- lines.iterator.drop(1).take(n).zipWithIndex
      (cell, j) <- line.trim.split("\\s+").iterator.zipWithIndex
      if cell == "1"
    } yield (i.toLong, j.toLong)
    edges.toSeq.toDF("src", "dst")
  }

  /** Serialize an edge DataFrame back to the reference text format.
    * Only for ≤`maxVertices` fixtures (the reference's own cap). */
  def format(edges: Seq[(Long, Long)], n: Int): String = {
    val adj = Array.fill(n, n)(0)
    edges.foreach { case (s, d) => adj(s.toInt)(d.toInt) = 1 }
    (n.toString +: adj.map(_.mkString(" ")).toSeq).mkString("", "\n", "\n")
  }
}

/** Graph store — A1 graph-create / A2 graph-modify / A4 graph-sink
  * (`primary_server.c:61-172`). The reference's "modify" is a full
  * overwrite of the file (same code path as create,
  * `primary_server.c:223`), i.e. snapshot-replace semantics — which maps
  * exactly to parquet overwrite and gives snapshot isolation for free
  * (replacing the reference's reader–writer semaphores, A8, which are
  * intentionally dropped: Spark reads immutable snapshots).
  */
object GraphStore {
  /** A1: create = snapshot write of the edge table. */
  def create(edges: DataFrame, path: String): Unit =
    edges.write.mode("overwrite").parquet(path)

  /** A2: modify ≡ create (snapshot replace, by reference semantics). */
  def modify(edges: DataFrame, path: String): Unit = create(edges, path)

  /** A3/A4: load a stored graph. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
