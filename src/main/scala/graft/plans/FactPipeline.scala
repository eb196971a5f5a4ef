package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E1 — the reference's core ETL composed Spark-first (SURVEY.md §3 E1,
  * §7.2 minimum slice): statement sheets → long-format fact table.
  *
  * Stages (reference anchor → operator):
  *  - KV metadata pivot (mainTesting.py:413-431 → A4): one wide row per
  *    filing from the key/value sheet, with the "PT " name prefix rule
  *    (:418-419 → P13), year-from-date (:430-431 → F10) and the
  *    month/quarter keyword mapping (:421-429 → F11);
  *  - header-skip (:54 → P1), null sentinel fill (:187-193 → P12);
  *  - metadata attach (:58 → J4) as a broadcast equi-join on filing_id;
  *  - conditional unit scaling x1e6 for Q1-Q3 filings (:55-57 + :428-429
  *    → F12);
  *  - idempotent-load gate (:693-729 → J2) as a left-anti join on the
  *    statement key.
  *
  * Scale notes: metadata (one row per filing) broadcasts; the fact side
  * is never shuffled by the attach. The anti-join shuffles on the
  * 4-column statement key only — at 100 TB the existing-keys side is a
  * compact distinct projection, typically also broadcastable.
  */
object FactPipeline {

  /** B1-shaped (filing_id, key, value) → one wide metadata row per
    * filing: (filing_id, kode_emiten, nama_emiten, tahun, quartal). */
  def metadataPivot(meta: DataFrame): DataFrame = {
    def kv(k: String) = max(when(col("key") === k, col("value")))
    meta.groupBy(col("filing_id"))
      .agg(
        kv("Kode entitas").as("kode_emiten"),
        kv("Nama entitas").as("raw_nama"),
        kv("Periode penyampaian laporan keuangan").as("periode"),
        kv("Tanggal awal periode berjalan").as("tanggal_awal"))
      .withColumn("nama_emiten",
        when(upper(substring(col("raw_nama"), 1, 2)) === "PT", col("raw_nama"))
          .otherwise(concat(lit("PT "), col("raw_nama"))))
      .withColumn("tahun", substring(col("tanggal_awal"), 1, 4).cast("int"))
      .withColumn("quartal",
        when(col("periode").contains("Kuartal III"), 3)
          .when(col("periode").contains("Kuartal II"), 2)
          .when(col("periode").contains("Kuartal I"), 1)
          .otherwise(4))
      .select("filing_id", "kode_emiten", "nama_emiten", "tahun", "quartal")
  }

  /** B2-shaped raw statement rows + pivoted metadata + existing fact
    * keys → new long-format fact rows (B5 schema minus notes). */
  def normalize(raw: DataFrame, metaWide: DataFrame, existing: DataFrame): DataFrame = {
    val cleaned = raw
      .filter(col("row_id") >= 3)                          // P1 header skip
      .withColumn("item", coalesce(col("item"), lit("-"))) // P12 sentinel
      .withColumn("value", coalesce(col("value"), lit(0.0)))
    val attached = cleaned.join(broadcast(metaWide), "filing_id") // J4
      .withColumn("nilai",                                  // F12 unit scaling
        when(col("quartal") =!= 4, col("value") * 1e6).otherwise(col("value")))
      .select(col("kode_emiten"), col("nama_emiten"), col("tahun"), col("quartal"),
        col("statement").as("grup_laporan_keuangan"), col("item"), col("nilai"))
    attached.join(existing.select("kode_emiten", "tahun", "quartal", "grup_laporan_keuangan").distinct(),
      Seq("kode_emiten", "tahun", "quartal", "grup_laporan_keuangan"),
      "left_anti")                                          // J2 idempotence gate
  }

  /** Full pipeline: load-twice must be a no-op (the property the
    * reference enforces with per-key SELECT probes). */
  def run(raw: DataFrame, meta: DataFrame, existing: DataFrame): DataFrame =
    normalize(raw, metadataPivot(meta), existing)
}
