package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Field-extraction and value-normalization helpers (SURVEY §2.1 S1 +
  * §2.8 replace-chains).
  */
object Extract {

  /** Regex field bank (reference `regex_dict`,
    * contestant/contestant_extract.py:33-49): each output field tries its
    * alternate patterns in order; the first pattern that matches wins
    * (null when none do). One projection over the raw text — at scan
    * speed, no UDFs. */
  def regexFieldBank(text: Column, bank: Seq[(String, Seq[String])]): Column = {
    val fields = bank.map { case (field, patterns) =>
      val alternates = patterns.map { p =>
        val m = regexp_extract(text, p, 1)
        when(m =!= "", m)
      }
      coalesce(alternates: _*).as(field)
    }
    struct(fields: _*)
  }

  /** Literal replace chain (reference `alter_key`'s 35 rules,
    * episodes/episodes_transform.py:38-80, and friends): applied in rule
    * order, as the reference does. Use for SHORT, genuinely ordered chains;
    * big name→canonical dictionaries belong in [[mappingJoin]]. */
  def replaceChain(c: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(c) { case (acc, (pattern, replacement)) =>
      regexp_replace(acc, pattern, replacement)
    }

  /** Data-driven canonicalization (the engine-policy form of the
    * reference's name-fix dictionaries, SURVEY §7.4): left-join a
    * broadcast mapping table (dirty → canonical) and keep the original
    * where no mapping exists. Mapping data stays versioned DATA, not code. */
  def mappingJoin(df: DataFrame, c: String, mapping: DataFrame,
                  fromCol: String, toCol: String): DataFrame = {
    val m = broadcast(mapping.select(col(fromCol).as("__from"), col(toCol).as("__to")))
    df.join(m, col(c) === col("__from"), "left")
      .withColumn(c, coalesce(col("__to"), col(c)))
      .drop("__from", "__to")
  }
}
