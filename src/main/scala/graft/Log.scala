package graft

import java.io.PrintStream
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneId}

/** Console logger with the reference's level set and line format
  * (handlers/logger_handler.py:1-46, colored_console_handler.py:1-30):
  * five levels — DEBUG < INFO < WARNING < ERROR < SUCCESS — a settable
  * max level, per-level ANSI colors, and the
  * `timestamp | LEVEL | module | message` line shape.
  *
  * Driver-side only (ops/CLI surface, never on an executor path). The
  * sink and clock are injectable so MainSpec can capture lines without
  * hijacking System.out; colors are suppressed when the sink is not a
  * terminal (`System.console == null`) unless forced, so piped/CI output
  * stays grep-clean.
  */
object Log {

  private val Red = "[91m"
  private val Green = "[92m"
  private val Yellow = "[93m"
  private val Blue = "[94m"
  private val Cyan = "[96m"
  private val Reset = "[0m"

  /** Severity order, logger_handler.py:16. */
  val Levels: Map[String, Int] =
    Map("DEBUG" -> 1, "INFO" -> 2, "WARNING" -> 3, "ERROR" -> 4, "SUCCESS" -> 5)

  private val colorOf: Map[String, String] = Map(
    "DEBUG" -> Cyan, "INFO" -> Blue, "WARNING" -> Yellow,
    "ERROR" -> Red, "SUCCESS" -> Green)

  @volatile private var maxLevel: String = "INFO"
  @volatile var out: PrintStream = System.out
  @volatile var colored: Boolean = System.console() != null
  /** Injectable clock (millis) — MainSpec pins it for stable lines. */
  @volatile var clock: () => Long = () => System.currentTimeMillis()

  /** logger_handler.py:18-24 — invalid levels fail loudly. */
  def setMaxLevel(level: String): Unit = {
    val up = level.toUpperCase
    require(Levels.contains(up), s"Invalid log level: $level")
    maxLevel = up
  }

  def currentMaxLevel: String = maxLevel

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(ZoneId.of("UTC"))

  /** One line, reference shape: `ts | LEVEL | module | message`. */
  def log(message: String, level: String = "INFO",
          module: String = "graft"): Unit = {
    val up = level.toUpperCase
    val sev = Levels.getOrElse(up,
      throw new IllegalArgumentException(s"Invalid log level: $level"))
    if (sev >= Levels(maxLevel)) {
      val ts = fmt.format(Instant.ofEpochMilli(clock()))
      val body =
        if (colored) s"${colorOf(up)}$message$Reset" else message
      out.println(s"$ts | $up | $module | $body")
    }
  }

  def debug(m: String, module: String = "graft"): Unit = log(m, "DEBUG", module)
  def info(m: String, module: String = "graft"): Unit = log(m, "INFO", module)
  def warning(m: String, module: String = "graft"): Unit = log(m, "WARNING", module)
  def error(m: String, module: String = "graft"): Unit = log(m, "ERROR", module)
  def success(m: String, module: String = "graft"): Unit = log(m, "SUCCESS", module)
}
