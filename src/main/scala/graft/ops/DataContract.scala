package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One declared field of a data contract (reference:
  * header_etl_test.py:35-47 and test/items_etl_test.py:43-57 — an external
  * metadata dict of type / max length / date format / nullable / key). */
case class ContractField(name: String,
                         dataType: String, // varchar | date | decimal | number
                         maxLength: Option[Int] = None,
                         precision: Option[(Int, Int)] = None,
                         format: Option[String] = None,
                         key: Boolean = false,
                         nullable: Boolean = true)

/** One violated contract rule with the number of offending rows. */
case class ContractViolation(field: String, rule: String, badRows: Long)

/** Declarative data-contract validation over raw (string-typed) batch
  * frames.
  *
  * The reference's checks are reproduced rule-for-rule — non-nullable ⇒
  * no NULLs, varchar ⇒ length ≤ max, date ⇒ parses with the declared
  * format — but evaluated in ONE aggregation job over a single scan
  * (the reference issues a separate `count()` job per field-rule:
  * header_etl_test.py:56-73; at 59 rules that is 59 full scans).
  *
  * Strengthened beyond the reference (it declares but never enforces
  * these): decimal(p,s) / number parseability via `try_cast`, and
  * composite-key uniqueness (one extra aggregate job, since distinctness
  * cannot ride the same scan's fold).
  */
object DataContract {

  /** The header CRM feed contract (reference: header_etl_test.py:35-47). */
  val HeaderContract: Seq[ContractField] = Seq(
    ContractField("contratto_cod", "varchar", maxLength = Some(9), key = true, nullable = false),
    ContractField("codice_ordine_sap", "varchar", maxLength = Some(10)),
    ContractField("tipo_contratto", "varchar", maxLength = Some(6), nullable = false),
    ContractField("codice_opec", "varchar", maxLength = Some(8), nullable = false),
    ContractField("data_firma", "date", format = Some("d/M/yyyy")),
    ContractField("net_amount", "decimal", precision = Some((18, 2)), nullable = false),
    ContractField("causale_annullamento", "varchar", maxLength = Some(50)),
    ContractField("data_annullamento", "date", format = Some("d/M/yyyy")),
    ContractField("codice_agente", "varchar", maxLength = Some(10), nullable = false),
    ContractField("status_quote", "varchar", maxLength = Some(50), key = true, nullable = false),
    ContractField("creazione_dta", "date", format = Some("d/M/yyyy"), nullable = false))

  /** The items CRM feed contract (reference: test/items_etl_test.py:43-57). */
  val ItemsContract: Seq[ContractField] = Seq(
    ContractField("contratto_cod", "varchar", maxLength = Some(9), key = true, nullable = false),
    ContractField("numero_annuncio", "varchar", maxLength = Some(2), key = true, nullable = false),
    ContractField("list_total", "decimal", precision = Some((18, 2)), nullable = false),
    ContractField("contracted_price", "decimal", precision = Some((18, 2))),
    ContractField("total_discount", "decimal", precision = Some((18, 2))),
    ContractField("data_attivazione", "date", format = Some("d/M/yyyy")),
    ContractField("data_fine_prestazione", "date", format = Some("d/M/yyyy")),
    ContractField("product_code", "varchar", maxLength = Some(50), nullable = false),
    ContractField("quantity", "number", nullable = false),
    ContractField("causale_annullamento", "varchar", maxLength = Some(50)),
    ContractField("data_annullamento", "date", format = Some("d/M/yyyy")),
    ContractField("status_item", "varchar", maxLength = Some(1), nullable = false),
    ContractField("creazione_dta", "date", format = Some("yyyyMMdd"), nullable = false))

  /** The violation predicate of one (field, rule), or Nil if the field's
    * declaration implies no such rule. */
  private def rules(f: ContractField): Seq[(String, Column)] = {
    val c = col(f.name)
    val nullRule =
      if (!f.nullable) Seq("not_null" -> c.isNull) else Nil
    val typeRule = f.dataType match {
      case "varchar" =>
        f.maxLength.map(m => s"max_length_$m" -> (length(c) > m)).toSeq
      case "date" =>
        val fmt = f.format.getOrElse("yyyy-MM-dd")
        Seq(s"date_format_$fmt" ->
          (c.isNotNull && to_date(c, fmt).isNull))
      case "decimal" =>
        val (p, s) = f.precision.getOrElse((18, 2))
        Seq(s"decimal_${p}_$s" ->
          (c.isNotNull && expr(s"try_cast(${f.name} AS decimal($p,$s))").isNull))
      case "number" =>
        Seq("number" -> (c.isNotNull && expr(s"try_cast(${f.name} AS double)").isNull))
      case other =>
        throw new IllegalArgumentException(s"unknown contract data_type '$other' for ${f.name}")
    }
    nullRule ++ typeRule
  }

  /** Evaluate every field rule in a single aggregation pass.
    * @param checkKeys also verify composite-key uniqueness (adds one
    *                  hash-aggregate job on the key columns)
    * @return all violated rules with offending-row counts (empty = clean) */
  def check(df: DataFrame, contract: Seq[ContractField],
            checkKeys: Boolean = true): Seq[ContractViolation] = {
    // coalesce: over an empty frame sum() is NULL and getLong would NPE —
    // an empty batch (a plausible empty CSV drop) must report clean
    val ruleCols = contract.flatMap(f => rules(f).map { case (rule, cond) =>
      (f.name, rule,
        coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L)).as(s"${f.name}__$rule"))
    })
    val row = df.agg(ruleCols.head._3, ruleCols.tail.map(_._3): _*).collect()(0)
    val ruleViolations = ruleCols.zipWithIndex.collect {
      case ((field, rule, _), i) if row.getLong(i) > 0 =>
        ContractViolation(field, rule, row.getLong(i))
    }

    val keyCols = contract.filter(_.key).map(_.name)
    val keyViolations =
      if (checkKeys && keyCols.nonEmpty) {
        val dups = df.groupBy(keyCols.map(col): _*).count()
          .filter(col("count") > 1)
          .agg(coalesce(sum("count"), lit(0L))).collect()(0).getLong(0)
        if (dups > 0)
          Seq(ContractViolation(keyCols.mkString(","), "key_unique", dups))
        else Nil
      } else Nil

    ruleViolations ++ keyViolations
  }

  /** Convenience assertion: throw with a readable report on violations. */
  def enforce(df: DataFrame, contract: Seq[ContractField],
              checkKeys: Boolean = true): Unit = {
    val v = check(df, contract, checkKeys)
    if (v.nonEmpty) throw new IllegalStateException(
      "data contract violated:\n" + v.map(x =>
        s"  ${x.field}: ${x.rule} (${x.badRows} rows)").mkString("\n"))
  }
}
