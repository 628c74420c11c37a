package graft.cli

import scala.util.control.NonFatal

import org.apache.spark.sql.Row

import graft.exec.ExecutionContext

/** Terminal UI — the reference's flagship frontend (`src/tui/`, ratatui;
  * tabs at `src/tui/ui/mod.rs:29-42`, key handling
  * `src/tui/handlers/sql.rs:26-133`). Re-expressed over jline3 (which
  * Spark already ships) with the same tab set and interaction model:
  *
  *  - tabs, in the reference's order: SQL (1) / FlightSQL (2) /
  *    History (3) / Logs (4) / Context (5). The FlightSQL tab executes
  *    through a REAL gRPC loopback client against the in-process Flight
  *    endpoint ([[graft.server.flight.FlightSqlClient]]); Logs tails the
  *    driver-side ring every observed request reports into
  *    ([[graft.core.LogRing]]).
  *  - modal keys, like the reference: normal mode `q` quit, `1`-`5` tab
  *    switch, `e` edit, `c` clear, Enter execute, ↑/↓ scroll results (or
  *    move the history selection / scroll logs); edit mode: type to
  *    insert, ←/→ move, Backspace delete, Enter newline, Esc back to
  *    normal. SQL and FlightSQL each keep their own editor + result pane.
  *  - History tab Enter recalls the selected statement into the editor of
  *    the tab it ran on.
  *
  * Architecture: [[TuiState]] is immutable, [[Tui.step]] is a pure
  * (state, key) → state transition with the SQL executors injected, and
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

  final case class HistEntry(sql: String, seconds: Double, rows: Long,
      error: Boolean, flight: Boolean = false)

  final case class TuiState(
      tab: Int = 0, // 0 SQL, 1 FlightSQL, 2 History, 3 Logs, 4 Context
      editing: Boolean = false,
      buffer: String = "",
      cursor: Int = 0,
      grid: Option[Grid] = None,
      error: Option[String] = None,
      scroll: Int = 0,
      fbuffer: String = "",
      fcursor: Int = 0,
      fgrid: Option[Grid] = None,
      ferror: Option[String] = None,
      fscroll: Int = 0,
      history: Vector[HistEntry] = Vector.empty,
      historySel: Int = 0,
      logScroll: Int = 0,
      quit: Boolean = false)

  /** Execute SQL → Right(grid) or Left(error). Injected so specs can drive
    * the UI with a stub; [[runSql]] is the real one and [[runFlight]] the
    * gRPC-loopback one for the FlightSQL tab.
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

  /** FlightSQL-tab executor: plan + fetch through the real gRPC channel
    * against the in-process Flight endpoint on `port` — the same wire path
    * an external FlightSQL client uses (reference:
    * `src/tui/state/tabs/flightsql.rs` drives its own client).
    */
  def runFlight(port: Int, limit: Int = 500): Exec = sql =>
    try {
      val t0 = System.nanoTime()
      // limit is applied INSIDE the client's incremental frame decode, so
      // a large SELECT buffers at most `limit` rows client-side instead of
      // the whole result (the server streams DoGet per batch)
      val (names, rows) = graft.server.flight.FlightSqlClient.execute(
        port, sql, limit = Some(limit))
      val secs = (System.nanoTime() - t0) / 1e9
      Right(Grid(names, rows, secs))
    } catch {
      case e: org.sparkproject.connect.grpc.StatusRuntimeException =>
        Left(String.valueOf(e.getStatus.getDescription))
      case NonFatal(e) => Left(String.valueOf(e.getMessage))
    }

  // ---- transitions ---------------------------------------------------

  def step(st: TuiState, key: Key, exec: Exec): TuiState =
    step(st, key, exec, exec)

  def step(st: TuiState, key: Key, exec: Exec, flightExec: Exec): TuiState =
    if (st.editing) stepEdit(st, key)
    else stepNormal(st, key, exec, flightExec)

  private def stepEdit(st: TuiState, key: Key): TuiState = {
    val flight = st.tab == 1
    val (buf, cur) = if (flight) (st.fbuffer, st.fcursor) else (st.buffer, st.cursor)
    def put(b: String, c: Int): TuiState =
      if (flight) st.copy(fbuffer = b, fcursor = c)
      else st.copy(buffer = b, cursor = c)
    key match {
      case Esc => st.copy(editing = false)
      case Ch(c) => put(buf.take(cur) + c + buf.drop(cur), cur + 1)
      case Enter => put(buf.take(cur) + "\n" + buf.drop(cur), cur + 1)
      case Backspace if cur > 0 => put(buf.take(cur - 1) + buf.drop(cur), cur - 1)
      case ArrowLeft if cur > 0 => put(buf, cur - 1)
      case ArrowRight if cur < buf.length => put(buf, cur + 1)
      case _ => st
    }
  }

  private def stepNormal(st: TuiState, key: Key, exec: Exec,
      flightExec: Exec): TuiState = key match {
    case Ch('q') => st.copy(quit = true)
    case Ch('1') => st.copy(tab = 0)
    case Ch('2') => st.copy(tab = 1)
    case Ch('3') => st.copy(tab = 2)
    case Ch('4') => st.copy(tab = 3)
    case Ch('5') => st.copy(tab = 4)
    case Ch('e') if st.tab == 0 || st.tab == 1 => st.copy(editing = true)
    case Ch('c') if st.tab == 0 =>
      st.copy(buffer = "", cursor = 0, grid = None, error = None, scroll = 0)
    case Ch('c') if st.tab == 1 =>
      st.copy(fbuffer = "", fcursor = 0, fgrid = None, ferror = None, fscroll = 0)
    case Enter if st.tab == 0 && st.buffer.trim.nonEmpty =>
      exec(st.buffer) match {
        case Right(g) => st.copy(grid = Some(g), error = None, scroll = 0,
          history = st.history :+
            HistEntry(st.buffer, g.seconds, g.rows.size.toLong, error = false))
        case Left(err) => st.copy(error = Some(err), grid = None,
          history = st.history :+ HistEntry(st.buffer, 0.0, 0L, error = true))
      }
    case Enter if st.tab == 1 && st.fbuffer.trim.nonEmpty =>
      flightExec(st.fbuffer) match {
        case Right(g) => st.copy(fgrid = Some(g), ferror = None, fscroll = 0,
          history = st.history :+ HistEntry(st.fbuffer, g.seconds,
            g.rows.size.toLong, error = false, flight = true))
        case Left(err) => st.copy(ferror = Some(err), fgrid = None,
          history = st.history :+
            HistEntry(st.fbuffer, 0.0, 0L, error = true, flight = true))
      }
    case Enter if st.tab == 2 && st.history.nonEmpty =>
      // recall the selected statement into the editor of its own surface
      val sel = st.history(st.historySel.min(st.history.size - 1))
      if (sel.flight)
        st.copy(tab = 1, fbuffer = sel.sql, fcursor = sel.sql.length)
      else st.copy(tab = 0, buffer = sel.sql, cursor = sel.sql.length)
    case Up if st.tab == 0 => st.copy(scroll = (st.scroll - 1).max(0))
    case Down if st.tab == 0 =>
      val maxScroll = st.grid.map(g => (g.rows.size - 1).max(0)).getOrElse(0)
      st.copy(scroll = (st.scroll + 1).min(maxScroll))
    case Up if st.tab == 1 => st.copy(fscroll = (st.fscroll - 1).max(0))
    case Down if st.tab == 1 =>
      val maxScroll = st.fgrid.map(g => (g.rows.size - 1).max(0)).getOrElse(0)
      st.copy(fscroll = (st.fscroll + 1).min(maxScroll))
    case Up if st.tab == 2 => st.copy(historySel = (st.historySel - 1).max(0))
    case Down if st.tab == 2 =>
      st.copy(historySel = (st.historySel + 1).min((st.history.size - 1).max(0)))
    // logScroll counts lines back from the tail: Up moves back in time
    case Up if st.tab == 3 => st.copy(logScroll = st.logScroll + 1)
    case Down if st.tab == 3 => st.copy(logScroll = (st.logScroll - 1).max(0))
    case _ => st
  }

  // ---- rendering -----------------------------------------------------

  private val tabNames = Seq("SQL (1)", "FlightSQL (2)", "History (3)",
    "Logs (4)", "Context (5)")

  /** Pure state → frame. `width`/`height` bound the layout; `context` is
    * the catalog/settings text the Context tab shows; `logs` is the log
    * ring snapshot the Logs tab tails.
    */
  def render(st: TuiState, width: Int = 100, height: Int = 30,
      context: String = "", logs: Seq[String] = Seq.empty): String = {
    val w = width.max(40)
    val tabs = tabNames.zipWithIndex.map { case (n, i) =>
      if (i == st.tab) s"[$n]" else s" $n " }.mkString(" ")
    val sep = "─" * w

    def pane(buffer: String, cursor: Int, grid: Option[Grid],
        error: Option[String], scroll: Int, hint: String): Seq[String] = {
      val bufShown =
        if (st.editing) buffer.take(cursor) + "█" + buffer.drop(cursor)
        else if (buffer.isEmpty) hint
        else buffer
      val editor = bufShown.split("\n", -1).toSeq.map("  " + _)
      val resultLines: Seq[String] = error match {
        case Some(err) => Seq(s"  ERROR: $err")
        case None => grid match {
          case None => Seq("  (no results yet)")
          case Some(g) =>
            val widths = g.columns.indices.map { i =>
              (g.columns(i).length +:
                g.rows.map(r => r(i).length)).max.min(24)
            }
            def fmt(cells: Seq[String]): String =
              "  " + cells.zip(widths).map { case (c, cw) =>
                c.take(cw).padTo(cw, ' ') }.mkString(" │ ")
            val visible = g.rows.slice(scroll, scroll + (height - editor.size - 8).max(3))
            (fmt(g.columns) + s"   (${g.rows.size} rows, ${f"${g.seconds}%.2f"}s)") +:
              fmt(widths.map("─" * _)) +:
              visible.map(fmt)
        }
      }
      (editor :+ sep) ++ resultLines
    }

    val body: Seq[String] = st.tab match {
      case 0 => pane(st.buffer, st.cursor, st.grid, st.error, st.scroll,
        "-- press 'e' to edit, Enter to run")
      case 1 => pane(st.fbuffer, st.fcursor, st.fgrid, st.ferror, st.fscroll,
        "-- FlightSQL via gRPC loopback: press 'e' to edit, Enter to run")
      case 2 =>
        if (st.history.isEmpty) Seq("  (no statements yet)")
        else st.history.zipWithIndex.map { case (h, i) =>
          val mark = if (i == st.historySel) "▶" else " "
          val flag = if (h.error) "ERR " else f"${h.seconds}%.2fs"
          val via = if (h.flight) "FSQL" else "SQL "
          s" $mark [$flag] [$via] ${h.sql.replace('\n', ' ').take(w - 21)}"
        }
      case 3 =>
        if (logs.isEmpty) Seq("  (no log lines yet)")
        else {
          val page = (height - 6).max(3)
          // default view = the TAIL; scrolling up moves back in time
          val start = (logs.size - page - st.logScroll).max(0)
          logs.slice(start, start + page).map("  " + _)
        }
      case _ =>
        if (context.isEmpty) Seq("  (no context)") else context.split("\n").toSeq.map("  " + _)
    }
    val mode = if (st.editing) "EDIT (Esc: normal)"
      else "NORMAL (e: edit · Enter: run · c: clear · 1-5: tabs · q: quit)"
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

  /** Interactive loop over a jline system terminal in raw mode. Starts an
    * in-process Flight endpoint on a loopback port for the FlightSQL tab
    * (stopped on exit).
    */
  def run(ctx: ExecutionContext): Unit = {
    val term = org.jline.terminal.TerminalBuilder.builder()
      .system(true).build()
    term.enterRawMode()
    val reader = term.reader()
    val exec = runSql(ctx)
    val flightServer = new graft.server.flight.FlightSqlServer(ctx, port = 0)
    flightServer.start()
    // streaming micro-batches land in observability_requests + the Logs
    // tab, like every other frontend request
    ctx.observeStreams()
    graft.core.LogRing.add(
      s"FlightSQL endpoint for the TUI on port ${flightServer.boundPort}")
    val flightExec = runFlight(flightServer.boundPort)
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
        print("\u001b[2J\u001b[H" + render(st, w, h, context,
          graft.core.LogRing.lines))
        Console.flush()
        st = step(st, decode(() => reader.read()), exec, flightExec)
      }
    } finally { flightServer.stop(); term.close() }
  }
}
