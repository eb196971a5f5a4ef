package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession builder carrying the engine's
  * recommended configuration. Each setting is a measured decision, not
  * a default copied forward:
  *
  *  - AQE on: runtime re-planning (skew-join splitting, partition
  *    coalescing, broadcast demotion) is the first line of defense at
  *    scales the planner can't estimate;
  *  - shuffle.partitions sized to cores for local runs — on a cluster
  *    set ~2-3x total executor cores; the 200 default is wrong in both
  *    directions;
  *  - UTC session timezone: timestamp arithmetic must not depend on
  *    driver locale (the DuckDB oracle compares in UTC);
  *  - extensions registered so `cosine_sim` is SQL-callable and the
  *    TopKPerKey strategy needs no per-query injection.
  */
object GraftSession {

  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); set once at build time so
      // no table loader has to mutate session config as a read side effect
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // write timestamps as INT64 micros, not the deprecated INT96:
      // INT96 chunks carry NO parquet statistics (verified on this
      // Spark build), which silently disables BOTH row-group pushdown
      // and the manifest data-skipping stats for timestamp columns —
      // and int64 is what every other lakehouse reader (DuckDB,
      // Iceberg, Delta) expects anyway
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")

  /** Local session sized to the machine (the test/bench shape). The
    * TopKPerKey strategy self-registers on first use via
    * `experimental.extraStrategies` (see TopKPerKeyPlan), so no
    * session-build hook is needed for it. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
