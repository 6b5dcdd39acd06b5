package graft.streaming

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** E3 failure alerting over a REAL SMTP conversation — the reference
  * mails on replication failure (`alert/mailer.py:24-38`:
  * `smtplib.SMTP(host).sendmail(from, to, msg)`); this is the same hop
  * without a mail library: the JDK ships none, but SMTP is a line
  * protocol, so a dependency-free RFC 5321 client (EHLO / MAIL FROM /
  * RCPT TO / DATA / QUIT over a socket) closes the last transport edge
  * that was previously a listener hook only. Plugs into
  * [[QueryMonitor]]'s `onFailure` seam.
  *
  * Design constraints honored:
  *  - called from a listener thread, never the data path — blocking I/O
  *    with a socket timeout is fine, and a mail failure must never take
  *    down replication (callers wrap with [[sendQuietly]]);
  *  - multiline replies ("250-..." continuation lines) are consumed per
  *    RFC 5321 §4.2.1; body lines starting with '.' are dot-stuffed
  *    (§4.5.2) so an error text containing a lone dot can't truncate
  *    the DATA section.
  */
final class SmtpAlerter(
    host: String,
    port: Int,
    from: String,
    to: Seq[String],
    timeoutMs: Int = 10000) {

  /** SMTP commands and headers are single-line by grammar: a CR/LF
    * embedded in an interpolated value (query name from user config, the
    * configured addresses) would otherwise inject commands into the
    * envelope or extra headers into the message (the error BODY is safe —
    * it is line-split and dot-stuffed). Flattened, not rejected: alerting
    * must fire on whatever name the failing query actually has.
    */
  private def oneLine(s: String): String = s.replaceAll("[\\r\\n]+", " ")

  /** Send the failure mail; throws on any protocol error. */
  def sendFailure(queryName: String, error: String): Unit = {
    // connect with the SAME bound as reads: the Socket(host, port)
    // constructor connects with NO timeout, so a blackholed mail host
    // would block the listener bus thread for the OS default TCP
    // timeout (minutes) despite timeoutMs — setSoTimeout only bounds
    // reads after the connection exists
    val socket = new Socket()
    try {
      socket.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
      socket.setSoTimeout(timeoutMs)
      val in = new BufferedReader(new InputStreamReader(
        socket.getInputStream, StandardCharsets.US_ASCII))
      val out = new BufferedWriter(new OutputStreamWriter(
        socket.getOutputStream, StandardCharsets.US_ASCII))
      def expect(code: String): Unit = {
        var line = in.readLine()
        if (line == null) sys.error("SMTP: connection closed")
        // RFC 5321 multiline reply: "250-..." continues, "250 ..." ends;
        // a connection dropped MID-reply must fail the same way as one
        // dropped before it (readLine returns null, not an exception)
        while (line != null && line.length >= 4 && line.charAt(3) == '-')
          line = in.readLine()
        if (line == null) sys.error("SMTP: connection closed")
        if (!line.startsWith(code))
          sys.error(s"SMTP: expected $code, got: $line")
      }
      def send(line: String): Unit = { out.write(line); out.write("\r\n"); out.flush() }
      expect("220")
      val safeFrom = oneLine(from)
      val safeTo = to.map(oneLine)
      send("EHLO graft"); expect("250")
      send(s"MAIL FROM:<$safeFrom>"); expect("250")
      safeTo.foreach { rcpt => send(s"RCPT TO:<$rcpt>"); expect("250") }
      send("DATA"); expect("354")
      val body = Seq(
        s"From: $safeFrom",
        s"To: ${safeTo.mkString(", ")}",
        s"Subject: [graft] replication query failed: ${oneLine(queryName)}",
        "",
        // the body line flattens the name too: a CRLF inside the
        // interpolation would leave send() emitting a multi-line "line"
        // whose embedded bare "." could terminate DATA early and whose
        // remainder would parse as SMTP commands — the exact injection
        // oneLine exists to stop (the error text is safe: it goes
        // through linesIterator + dot-stuffing below)
        s"Streaming query '${oneLine(queryName)}' terminated with an exception:",
        "") ++ error.linesIterator
      body.foreach { l =>
        send(if (l.startsWith(".")) "." + l else l) // dot-stuffing
      }
      send("."); expect("250")
      send("QUIT"); expect("221")
    } finally socket.close()
  }

  /** The [[QueryMonitor.onFailure]]-shaped form: alerting is best-effort
    * by contract — a dead mail host must never cascade into the
    * replication control plane (the reference's mailer swallows too).
    * Returns whether the mail went out, for callers that log.
    */
  def sendQuietly(queryName: String, error: String): Boolean =
    try { sendFailure(queryName, error); true }
    catch { case _: Exception => false }
}
