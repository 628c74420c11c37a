package graft.cli

import scala.util.control.NonFatal

import org.apache.spark.sql.Row

import graft.exec.ExecutionContext

/** Terminal UI — the reference's flagship frontend (`src/tui/`, ratatui;
  * tabs at `src/tui/ui/mod.rs:29-42`, key handling
  * `src/tui/handlers/sql.rs:26-133`). Re-expressed over jline3 (which
  * Spark already ships) with the same interaction model:
  *
  *  - tabs: SQL (1) / History (2) / Context (3) — the reference's
  *    FlightSQL and Logs tabs collapse into the shared execution path and
  *    the driver log here;
  *  - modal keys, like the reference: normal mode `q` quit, `1`-`3` tab
  *    switch, `e` edit, `c` clear, Enter execute, ↑/↓ scroll results (or
  *    move the history selection); edit mode: type to insert, ←/→ move,
  *    Backspace delete, Enter newline, Esc back to normal;
  *  - History tab Enter recalls the selected statement into the editor.
  *
  * Architecture: [[TuiState]] is immutable, [[Tui.step]] is a pure
  * (state, key) → state transition with the SQL executor injected, and
  * [[Tui.render]] is a pure state → frame string — the whole UI is
  * spec-testable without a terminal. The jline loop ([[Tui.run]]) only
  * decodes keystrokes and repaints.
  */
object Tui {

  sealed trait Key
  final case class Ch(c: Char) extends Key
  case object Enter extends Key
  case object Esc extends Key
  case object Backspace extends Key
  case object Up extends Key
  case object Down extends Key
  case object ArrowLeft extends Key
  case object ArrowRight extends Key

  final case class Grid(columns: Seq[String], rows: Seq[Seq[String]], seconds: Double)

  final case class HistEntry(sql: String, seconds: Double, rows: Long, error: Boolean)

  final case class TuiState(
      tab: Int = 0, // 0 SQL, 1 History, 2 Context
      editing: Boolean = false,
      buffer: String = "",
      cursor: Int = 0,
      grid: Option[Grid] = None,
      error: Option[String] = None,
      scroll: Int = 0,
      history: Vector[HistEntry] = Vector.empty,
      historySel: Int = 0,
      quit: Boolean = false)

  /** Execute SQL → Right(grid) or Left(error). Injected so specs can drive
    * the UI with a stub; [[runSql]] is the real one.
    */
  type Exec = String => Either[String, Grid]

  def runSql(ctx: ExecutionContext, limit: Int = 500): Exec = sql =>
    try {
      val t0 = System.nanoTime()
      val df = ctx.sqlObserved(sql, "tui")
      val rows = df.limit(limit).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      Right(Grid(df.columns.toSeq,
        rows.toSeq.map((r: Row) =>
          (0 until r.length).map(i => String.valueOf(r.get(i)))),
        secs))
    } catch { case NonFatal(e) => Left(String.valueOf(e.getMessage)) }

  // ---- transitions ---------------------------------------------------

  def step(st: TuiState, key: Key, exec: Exec): TuiState =
    if (st.editing) stepEdit(st, key)
    else stepNormal(st, key, exec)

  private def stepEdit(st: TuiState, key: Key): TuiState = key match {
    case Esc => st.copy(editing = false)
    case Ch(c) =>
      st.copy(buffer = st.buffer.take(st.cursor) + c + st.buffer.drop(st.cursor),
        cursor = st.cursor + 1)
    case Enter =>
      st.copy(buffer = st.buffer.take(st.cursor) + "\n" + st.buffer.drop(st.cursor),
        cursor = st.cursor + 1)
    case Backspace if st.cursor > 0 =>
      st.copy(buffer = st.buffer.take(st.cursor - 1) + st.buffer.drop(st.cursor),
        cursor = st.cursor - 1)
    case ArrowLeft if st.cursor > 0 => st.copy(cursor = st.cursor - 1)
    case ArrowRight if st.cursor < st.buffer.length => st.copy(cursor = st.cursor + 1)
    case _ => st
  }

  private def stepNormal(st: TuiState, key: Key, exec: Exec): TuiState = key match {
    case Ch('q') => st.copy(quit = true)
    case Ch('1') => st.copy(tab = 0)
    case Ch('2') => st.copy(tab = 1)
    case Ch('3') => st.copy(tab = 2)
    case Ch('e') if st.tab == 0 => st.copy(editing = true)
    case Ch('c') if st.tab == 0 =>
      st.copy(buffer = "", cursor = 0, grid = None, error = None, scroll = 0)
    case Enter if st.tab == 0 && st.buffer.trim.nonEmpty =>
      exec(st.buffer) match {
        case Right(g) => st.copy(grid = Some(g), error = None, scroll = 0,
          history = st.history :+
            HistEntry(st.buffer, g.seconds, g.rows.size.toLong, error = false))
        case Left(err) => st.copy(error = Some(err), grid = None,
          history = st.history :+ HistEntry(st.buffer, 0.0, 0L, error = true))
      }
    case Enter if st.tab == 1 && st.history.nonEmpty =>
      // recall the selected statement into the editor, like the reference
      val sel = st.history(st.historySel.min(st.history.size - 1))
      st.copy(tab = 0, buffer = sel.sql, cursor = sel.sql.length)
    case Up if st.tab == 0 => st.copy(scroll = (st.scroll - 1).max(0))
    case Down if st.tab == 0 =>
      val maxScroll = st.grid.map(g => (g.rows.size - 1).max(0)).getOrElse(0)
      st.copy(scroll = (st.scroll + 1).min(maxScroll))
    case Up if st.tab == 1 => st.copy(historySel = (st.historySel - 1).max(0))
    case Down if st.tab == 1 =>
      st.copy(historySel = (st.historySel + 1).min((st.history.size - 1).max(0)))
    case _ => st
  }

  // ---- rendering -----------------------------------------------------

  private val tabNames = Seq("SQL (1)", "History (2)", "Context (3)")

  /** Pure state → frame. `width`/`height` bound the layout; `context` is
    * the catalog/settings text the Context tab shows.
    */
  def render(st: TuiState, width: Int = 100, height: Int = 30,
      context: String = ""): String = {
    val w = width.max(40)
    val tabs = tabNames.zipWithIndex.map { case (n, i) =>
      if (i == st.tab) s"[$n]" else s" $n " }.mkString(" ")
    val sep = "─" * w
    val body: Seq[String] = st.tab match {
      case 0 =>
        val bufShown =
          if (st.editing) st.buffer.take(st.cursor) + "█" + st.buffer.drop(st.cursor)
          else if (st.buffer.isEmpty) "-- press 'e' to edit, Enter to run"
          else st.buffer
        val editor = bufShown.split("\n", -1).toSeq.map("  " + _)
        val resultLines: Seq[String] = st.error match {
          case Some(err) => Seq(s"  ERROR: $err")
          case None => st.grid match {
            case None => Seq("  (no results yet)")
            case Some(g) =>
              val widths = g.columns.indices.map { i =>
                (g.columns(i).length +:
                  g.rows.map(r => r(i).length)).max.min(24)
              }
              def fmt(cells: Seq[String]): String =
                "  " + cells.zip(widths).map { case (c, cw) =>
                  c.take(cw).padTo(cw, ' ') }.mkString(" │ ")
              val visible = g.rows.slice(st.scroll, st.scroll + (height - editor.size - 8).max(3))
              (fmt(g.columns) + s"   (${g.rows.size} rows, ${f"${g.seconds}%.2f"}s)") +:
                fmt(widths.map("─" * _)) +:
                visible.map(fmt)
          }
        }
        (editor :+ sep) ++ resultLines
      case 1 =>
        if (st.history.isEmpty) Seq("  (no statements yet)")
        else st.history.zipWithIndex.map { case (h, i) =>
          val mark = if (i == st.historySel) "▶" else " "
          val flag = if (h.error) "ERR " else f"${h.seconds}%.2fs"
          s" $mark [$flag] ${h.sql.replace('\n', ' ').take(w - 14)}"
        }
      case _ =>
        if (context.isEmpty) Seq("  (no context)") else context.split("\n").toSeq.map("  " + _)
    }
    val mode = if (st.editing) "EDIT (Esc: normal)"
      else "NORMAL (e: edit · Enter: run · c: clear · 1-3: tabs · q: quit)"
    (Seq(tabs, sep) ++ body ++ Seq(sep, s" $mode")).mkString("\n")
  }

  // ---- terminal loop -------------------------------------------------

  /** Decode one keystroke, including the CSI arrow sequences. */
  private[graft] def decode(read: () => Int): Key = read() match {
    case 27 =>
      // either a bare Esc or an escape sequence
      read() match {
        case '[' => read() match {
          case 'A' => Up
          case 'B' => Down
          case 'C' => ArrowRight
          case 'D' => ArrowLeft
          case _ => Esc
        }
        case _ => Esc
      }
    case 13 | 10 => Enter
    case 127 | 8 => Backspace
    case c if c >= 32 => Ch(c.toChar)
    case _ => Esc
  }

  /** Interactive loop over a jline system terminal in raw mode. */
  def run(ctx: ExecutionContext): Unit = {
    val term = org.jline.terminal.TerminalBuilder.builder()
      .system(true).build()
    term.enterRawMode()
    val reader = term.reader()
    val exec = runSql(ctx)
    val context =
      try {
        val tables = ctx.sql(
          "SELECT table_schema, table_name, table_type FROM information_schema.tables")
          .collect().map(r => s"${r.get(0)}.${r.get(1)} (${r.get(2)})")
        ("Tables:" +: tables.toSeq).mkString("\n")
      } catch { case NonFatal(e) => s"context unavailable: ${e.getMessage}" }
    var st = TuiState()
    try {
      while (!st.quit) {
        val w = if (term.getWidth > 0) term.getWidth else 100
        val h = if (term.getHeight > 0) term.getHeight else 30
        // clear + home, then the frame
        print("\u001b[2J\u001b[H" + render(st, w, h, context))
        Console.flush()
        st = step(st, decode(() => reader.read()), exec)
      }
    } finally term.close()
  }
}
