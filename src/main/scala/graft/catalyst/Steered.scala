package graft.catalyst

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Literal

/** Per-query learned-hint registry — the piece that makes steering
  * per-QUERY rather than per-session, mirroring the reference's workload
  * matrix rows (each query file gets its own hint choice,
  * `/root/reference/src/strategies/limeqo.py:71-100`).
  *
  * A query is identified by a literal-insensitive fingerprint of its
  * ANALYZED plan: same query template with different constants → same row
  * of the steering matrix (the reference keys rows by SQL-file sha1;
  * template fingerprinting is the engine equivalent that also unifies
  * parameterized re-executions). [[SteeringLoop.steer]] populates the
  * registry with its recommendation when asked to learn; [[run]] replays
  * any future execution of that template under its learned strategy by
  * setting the session steering conf that [[HintSteeringRule]] enforces.
  */
object Steered {

  private val learned = TrieMap.empty[String, String]

  /** Literal-insensitive md5 fingerprint of the analyzed plan (exprIds
    * normalized by canonicalization, constants nulled out). */
  def fingerprint(df: DataFrame): String = {
    val norm = df.queryExecution.analyzed.canonicalized.transformAllExpressions {
      case l: Literal => Literal.create(null, l.dataType)
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(norm.toString.getBytes(UTF_8)).map("%02x".format(_)).mkString
  }

  def learn(df: DataFrame, strategy: String): Unit =
    learned.put(fingerprint(df), strategy)

  def strategyFor(df: DataFrame): Option[String] = learned.get(fingerprint(df))

  def clear(): Unit = learned.clear()

  /** Persist the registry as one JSON object {fingerprint: strategy} —
    * learned hints survive across sessions/deploys (the reference's
    * equivalent artifact is the per-round trace JSON; ours is the final
    * decision table). */
  def save(path: java.nio.file.Path): Unit = {
    // full JSON string escape incl. control chars — a tab/newline in a
    // strategy name must not produce an unparseable artifact
    def esc(s: String) = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val body = learned.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n  ", ",\n  ", "\n}")
    Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(path, body)
  }

  /** Load (merge) a registry saved by [[save]]. */
  def load(path: java.nio.file.Path): Int = {
    val text = java.nio.file.Files.readString(path)
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    def unesc(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s(i) == '\\' && i + 1 < s.length) s(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' if i + 6 <= s.length =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case c => sb += c; i += 2
        } else { sb += s(i); i += 1 }
      }
      sb.toString
    }
    var n = 0
    entry.findAllMatchIn(text).foreach { m =>
      learned.put(unesc(m.group(1)), unesc(m.group(2)))
      n += 1
    }
    n
  }

  /** Execute `action` on `df` under its learned strategy (no-op for
    * unknown templates). The steering conf is session-scoped, so learned
    * hints for concurrently-running distinct templates should use separate
    * sessions (`spark.newSession()` shares the registry, not the conf). */
  def run[T](df: DataFrame)(action: DataFrame => T): T = {
    val spark = df.sparkSession
    strategyFor(df) match {
      case None => action(df)
      case Some(strategy) =>
        val prev = spark.conf.getOption(HintSteeringRule.ConfKey)
        spark.conf.set(HintSteeringRule.ConfKey, strategy)
        // re-plan under the hint: a Dataset memoizes its QueryExecution on
        // first use, so a df whose plan was already forced (count/explain)
        // would silently keep the unhinted plan; the no-op projection
        // wraps the same logical plan in a fresh Dataset that plans now,
        // with the steering conf in effect
        val fresh = df.select(org.apache.spark.sql.functions.col("*"))
        try action(fresh)
        finally prev match {
          case Some(v) => spark.conf.set(HintSteeringRule.ConfKey, v)
          case None => spark.conf.unset(HintSteeringRule.ConfKey)
        }
    }
  }
}
