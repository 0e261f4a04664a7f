package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S7: GML graph serialize/load (SURVEY §2.1).
  *
  * The reference round-trips its SNOMED graph through NetworkX GML
  * (`2nd Place/src/snomed_graph.py:322-331` save → nx.write_gml,
  * `:360-371` from_serialized → nx.read_gml with destringizer=int); the
  * graph itself stays two relations here (nodes, edges — the `to_pandas`
  * analog at `snomed_graph.py:333-346`), and GML is just a text
  * serialization of them.
  *
  * Wire format: valid GML with ONE record per line — `node [ id 7
  * label "x" ]` / `edge [ source 1 target 2 label "is_a" ]` — instead of
  * NetworkX's pretty-printed multi-line blocks. Single-line records keep
  * both directions distributed: the writer is a plain text sink and the
  * reader is a line-wise `spark.read.text` + regexp projection (no
  * whole-file parse, no driver materialization), so a 100×-scale graph
  * serializes and loads partition-parallel. Labels are quoted with the
  * same `&`/`"` HTML-entity escaping NetworkX emits.
  */
object Gml {

  /** `&` first on the way in, last on the way out; newlines/CRs become
    * numeric entities (nx writes non-printables as `&#NN;`) — without this
    * a label containing a line break would split its record across
    * physical lines and silently mis-parse on read. */
  private def esc(c: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, lit("&"), lit("&amp;")), lit("\""), lit("&quot;")),
      lit("\n"), lit("&#10;")), lit("\r"), lit("&#13;"))

  private def unesc(c: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, lit("&#13;"), lit("\r")), lit("&#10;"), lit("\n")),
      lit("&quot;"), lit("\"")), lit("&amp;"), lit("&"))

  /** Serialize nodes(id: Long, label: String) + edges(source: Long,
    * target: Long, etype: String) as GML text under `path`. Node lines are
    * written before edge lines (GML requires it only stylistically, but
    * NetworkX emits that order); `coalesceOne` yields the reference's
    * single-file artifact, otherwise the graph shards one GML fragment per
    * partition and [[read]] accepts the directory. The `graph [` / `]`
    * wrapper rides as header/footer lines of part files; the reader
    * ignores them wherever they appear. */
  def write(nodes: DataFrame, edges: DataFrame, path: String,
            coalesceOne: Boolean = true): Unit = {
    val nodeLines = nodes.select(concat(lit("node [ id "), col("id"),
      lit(" label \""), esc(col("label")), lit("\" ]")).as("value"))
    val edgeLines = edges.select(concat(lit("edge [ source "), col("source"),
      lit(" target "), col("target"),
      lit(" label \""), esc(col("etype")), lit("\" ]")).as("value"))
    val header = nodes.sparkSession.range(1)
      .select(lit("graph [ directed 1").as("value"))
    val footer = nodes.sparkSession.range(1).select(lit("]").as("value"))
    val out = header.union(nodeLines).union(edgeLines).union(footer)
    (if (coalesceOne) out.coalesce(1) else out)
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** Parse a GML file (or shard directory) written by [[write]] back into
    * (nodes, edges) DataFrames. Line-wise: each record line is projected
    * by regexp (ids destringized to Long — the nx.read_gml
    * `destringizer=int` analog); wrapper lines match neither pattern and
    * drop out. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val lines = spark.read.text(path)
    val nodes = lines
      .filter(col("value").startsWith("node [ "))
      .select(
        regexp_extract(col("value"), "^node \\[ id (-?\\d+) ", 1)
          .cast("long").as("id"),
        unesc(regexp_extract(col("value"), " label \"(.*)\" \\]$", 1)).as("label"))
    val edges = lines
      .filter(col("value").startsWith("edge [ "))
      .select(
        regexp_extract(col("value"), "^edge \\[ source (-?\\d+) ", 1)
          .cast("long").as("source"),
        regexp_extract(col("value"), " target (-?\\d+) ", 1)
          .cast("long").as("target"),
        unesc(regexp_extract(col("value"), " label \"(.*)\" \\]$", 1)).as("etype"))
    (nodes, edges)
  }
}
