package graft.sources.v2

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-process HTTP endpoint serving a directory of `page-*.tsv` files —
  * the zero-egress stand-in for the reference's REST export service
  * (feeder.py:22-47). Lets [[HttpPageTransport]] run end-to-end in a
  * sandbox with no network: the loopback socket is the wire, the
  * protocol is the real one.
  *
  * Serves:
  *   - `GET /_PAGES` — the page manifest (`pages=N`), synthesized from
  *     the directory listing when the sink hasn't written one;
  *   - `GET /page-NNNNN.tsv` — a page, honoring single-range
  *     `Range: bytes=a-b` / `bytes=-n` requests with 206 + Content-Range
  *     responses so the transport's zone/size probes stay bounded;
  *   - anything else — 404.
  *
  * `failFirst(n)` arms fault injection: the next `n` page GETs answer
  * 503 before the file is served, exercising the transport's bounded
  * retry/backoff the way a flaky production endpoint would.
  *
  * One server per directory, started lazily and stopped by a JVM
  * shutdown hook — the DataFrames built over it are lazy plans that
  * execute long after the builder returns, so the endpoint must outlive
  * the call (same lifetime device as the paged fixture dirs). */
object LoopbackPageServer {
  private val servers = scala.collection.concurrent.TrieMap.empty[String, (HttpServer, Faults)]

  private final class Faults {
    val remaining = new java.util.concurrent.atomic.AtomicInteger(0)
  }

  /** Base URL (`http://127.0.0.1:<port>`) of the server for `dir`,
    * starting it on a free port on first use. */
  def serve(dir: String): String = {
    val (srv, _) = servers.getOrElseUpdate(dir, start(dir))
    s"http://127.0.0.1:${srv.getAddress.getPort}"
  }

  /** Arm fault injection for `dir`: the next `n` page GETs return 503. */
  def failFirst(dir: String, n: Int): Unit =
    servers.get(dir).foreach(_._2.remaining.set(n))

  /** The server's internal threads (HTTP-Dispatcher, idle-timeout
    * timer) inherit daemon status from the creating thread and would
    * otherwise pin the JVM open after main() returns (observed: a
    * completed Verify run that never exited). Create AND start the
    * server from a short-lived daemon thread so everything it spawns
    * is a daemon; handler threads get an explicit daemon factory. */
  private def start(dir: String): (HttpServer, Faults) = {
    @volatile var out: (HttpServer, Faults) = null
    @volatile var err: Throwable = null
    val t = new Thread(() => {
      try out = startDaemonContext(dir)
      catch { case e: Throwable => err = e }
    }, "loopback-page-server-boot")
    t.setDaemon(true)
    t.start()
    t.join()
    if (err != null) throw err
    out
  }

  private def startDaemonContext(dir: String): (HttpServer, Faults) = {
    val faults = new Faults
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try route(ex)
        finally ex.close()
      }

      private def route(ex: HttpExchange): Unit = {
        val name = ex.getRequestURI.getPath.stripPrefix("/")
        if (name == "_PAGES") return manifest(ex)
        if (!name.startsWith("page-") || !name.endsWith(".tsv") ||
          name.contains("/") || name.contains(".."))
          return send(ex, 404, Array.empty)
        val f = new java.io.File(dir, name)
        if (!f.isFile) return send(ex, 404, Array.empty)
        if (faults.remaining.getAndUpdate(n => math.max(n - 1, 0)) > 0)
          return send(ex, 503, Array.empty)
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        rangeOf(ex, bytes.length) match {
          case Some((a, b)) =>
            ex.getResponseHeaders.set("Content-Range",
              s"bytes $a-$b/${bytes.length}")
            send(ex, 206, java.util.Arrays.copyOfRange(bytes, a, b + 1))
          case None =>
            send(ex, 200, bytes)
        }
      }

      private def manifest(ex: HttpExchange): Unit = {
        val own = new java.io.File(dir, "_PAGES")
        val body =
          if (own.isFile) java.nio.file.Files.readAllBytes(own.toPath)
          else {
            val n = Option(new java.io.File(dir).listFiles())
              .getOrElse(Array.empty[java.io.File])
              .count(f => f.isFile && f.getName.startsWith("page-") &&
                f.getName.endsWith(".tsv"))
            s"pages=$n\n".getBytes("UTF-8")
          }
        send(ex, 200, body)
      }

      /** Single-range parse: `bytes=a-b`, `bytes=a-`, `bytes=-n` →
        * inclusive [a, b] clamped to the entity; None → whole entity. */
      private def rangeOf(ex: HttpExchange, len: Int): Option[(Int, Int)] = {
        val h = Option(ex.getRequestHeaders.getFirst("Range")).getOrElse("")
        if (!h.startsWith("bytes=") || len == 0) return None
        val spec = h.stripPrefix("bytes=")
        val (a, b) = spec.split("-", -1) match {
          case Array("", n) if n.nonEmpty => // suffix: last n bytes
            (math.max(len - n.toInt, 0), len - 1)
          case Array(s, "") if s.nonEmpty => (s.toInt, len - 1)
          case Array(s, e) if s.nonEmpty && e.nonEmpty =>
            (s.toInt, math.min(e.toInt, len - 1))
          case _ => return None
        }
        if (a > b || a >= len) None else Some((a, b))
      }

      private def send(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
        ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
        if (body.nonEmpty) {
          val os = ex.getResponseBody
          os.write(body)
          os.close()
        }
      }
    })
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8,
      (r: Runnable) => {
        val th = new Thread(r, "loopback-page-server-worker")
        th.setDaemon(true)
        th
      }))
    srv.start()
    Runtime.getRuntime.addShutdownHook(new Thread(() => srv.stop(0)))
    (srv, faults)
  }
}
