package graft.search

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** The reference's controller-level auth step (metastore/blueprint.py:22-28):
  * an HS256 JWT from the request is decoded to a `userid`, and ANY invalid
  * token — malformed, bad signature, wrong algorithm, missing claim — is
  * treated exactly like an anonymous request (the reference swallows
  * `jwt.InvalidTokenError` and proceeds with `userid = None`).
  *
  * Pure function `token → Option[userid]`: the output plugs straight into
  * [[SearchRequest.userid]] / [[MetastoreApi]].
  */
object AuthToken {

  private val b64 = Base64.getUrlDecoder
  private val b64e = Base64.getUrlEncoder.withoutPadding()

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  private def parseJson(s: String): Option[java.util.Map[String, Object]] =
    try {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      Some(m.readValue(s, classOf[java.util.HashMap[String, Object]]))
    } catch { case _: Exception => None }

  /** Registered time claims, pinned to pyjwt 1.x semantics — the version
    * family the reference's bare `jwt.decode(token, PRIVATE_KEY)` call
    * (blueprint.py:26) runs on (pyjwt 2.x made `algorithms=` mandatory,
    * so that call raises there). pyjwt 1.x verifies `exp`/`nbf` when
    * present with zero leeway and coerces each claim via `int(...)`, so a
    * numeric-string claim like "123" is accepted; a non-coercible value
    * is malformed. Both failure modes degrade to anonymous. Boundary per
    * 1.x: expired iff exp < now (exp == now still valid; 2.x tightened
    * this to exp <= now — we keep the 1.x rule).
    */
  private def timeClaimsValid(payload: java.util.Map[String, Object], nowSec: Long): Boolean = {
    def numeric(v: Object): Option[Long] = v match {
      case n: java.lang.Number => Some(n.longValue())
      case s: String => // pyjwt's int() coercion accepts integer strings
        try Some(java.lang.Long.parseLong(s.trim))
        catch { case _: NumberFormatException => None }
      case _ => None // claim present but non-coercible ⇒ malformed token
    }
    // pyjwt 1.x boundaries: expired iff exp < now; not-yet-valid iff nbf > now
    val exp = Option(payload.get("exp")).map(v => numeric(v).exists(_ >= nowSec))
    val nbf = Option(payload.get("nbf")).map(v => numeric(v).exists(_ <= nowSec))
    exp.getOrElse(true) && nbf.getOrElse(true)
  }

  /** Verify + decode: returns the `userid` claim of a valid HS256 token,
    * None for anything else (invalid-token ≡ anonymous rule).
    */
  def userid(token: String, key: Array[Byte]): Option[String] =
    userid(token, key, System.currentTimeMillis() / 1000)

  /** As [[userid]] with an explicit clock (seconds since epoch) so exp/nbf
    * handling is deterministic in tests.
    */
  def userid(token: String, key: Array[Byte], nowSec: Long): Option[String] =
    try {
      for {
        t <- Option(token)
        parts = t.split('.') if parts.length == 3
        header <- parseJson(new String(b64.decode(parts(0)), UTF_8))
        if header.get("alg") == "HS256"
        sig = b64.decode(parts(2))
        if java.security.MessageDigest.isEqual(sig, hmac(key, s"${parts(0)}.${parts(1)}"))
        payload <- parseJson(new String(b64.decode(parts(1)), UTF_8))
        if timeClaimsValid(payload, nowSec)
        uid <- Option(payload.get("userid")).collect { case s: String => s }
      } yield uid
    } catch { case _: IllegalArgumentException => None } // bad base64 ≡ anonymous

  /** Mint a token (test/tooling side of the contract). `claims` adds
    * numeric registered claims (e.g. "exp", "nbf") to the payload.
    */
  def sign(userid: String, key: Array[Byte], claims: Map[String, Long] = Map.empty): String = {
    val extra = claims.toSeq.sortBy(_._1).map { case (k, v) => s""","$k":$v""" }.mkString
    val header = b64e.encodeToString("""{"alg":"HS256","typ":"JWT"}""".getBytes(UTF_8))
    val payload = b64e.encodeToString(s"""{"userid":"$userid"$extra}""".getBytes(UTF_8))
    val sig = b64e.encodeToString(hmac(key, s"$header.$payload"))
    s"$header.$payload.$sig"
  }
}
