package graft

import com.fasterxml.jackson.databind.JsonNode
import graft.codec.{Codec, Upcaster}
import graft.log.EventDetail
import graft.store.AggregateType

/** The Account domain fixture: same event kinds, payload shapes and golden
  * values as the reference test suite (test/aggregate.go, test/aggregatev2.go)
  * — independent implementation, used to reproduce golden scenarios G1-G8.
  */
case class Account(status: String, balance: Long, owner: String)

object AccountType extends AggregateType[Account] {
  val kind = "Account"
  val empty = Account("", 0, "")

  def fold(state: Account, eventKind: String, body: String): Account = {
    val n = Codec.parse(body)
    eventKind match {
      case "AccountCreated" =>
        Account("OPEN", n.get("money").asLong(), n.get("owner").asText())
      case "MoneyDeposited" => state.copy(balance = state.balance + n.get("money").asLong())
      case "MoneyWithdrawn" => state.copy(balance = state.balance - n.get("money").asLong())
      case "OwnerUpdated" => state.copy(owner = n.get("owner").asText())
      case "Invalidated" | "NoOp" => state
      case other => sys.error(s"unknown event kind $other")
    }
  }

  def encodeState(a: Account): String = {
    val o = Codec.obj()
    o.put("status", a.status); o.put("balance", a.balance); o.put("owner", a.owner)
    Codec.write(o)
  }

  def decodeState(body: String): Account = {
    val n = Codec.parse(body)
    Account(n.get("status").asText(), n.get("balance").asLong(), n.get("owner").asText())
  }

  def created(money: Long, owner: String): EventDetail = {
    val o = Codec.obj(); o.put("money", money); o.put("owner", owner)
    EventDetail("AccountCreated", Codec.write(o))
  }
  def deposited(money: Long): EventDetail = {
    val o = Codec.obj(); o.put("money", money)
    EventDetail("MoneyDeposited", Codec.write(o))
  }
  def withdrawn(money: Long): EventDetail = {
    val o = Codec.obj(); o.put("money", money)
    EventDetail("MoneyWithdrawn", Codec.write(o))
  }
  def ownerUpdated(owner: String): EventDetail = {
    val o = Codec.obj(); o.put("owner", owner)
    EventDetail("OwnerUpdated", Codec.write(o))
  }
}

/** V2: owner becomes a {firstName, lastName} struct. */
case class AccountV2(status: String, balance: Long, firstName: String, lastName: String)

object AccountV2Type extends AggregateType[AccountV2] {
  val kind = "Account_V2"
  val empty = AccountV2("", 0, "", "")

  /** Name-split rule from the reference upcast (test/aggregatev2.go:264-276):
    * first half of the space-split tokens is the first name, rest the last.
    */
  def splitName(full: String): (String, String) = {
    val tokens = full.split(" ").toSeq
    val n = tokens.length / 2
    (tokens.take(n).mkString(" "), tokens.drop(n).mkString(" "))
  }

  def fold(state: AccountV2, eventKind: String, body: String): AccountV2 = {
    val n = Codec.parse(body)
    eventKind match {
      case "AccountCreated_V2" =>
        AccountV2("OPEN", n.get("money").asLong(),
          n.get("owner").get("firstName").asText(), n.get("owner").get("lastName").asText())
      case "MoneyDeposited" => state.copy(balance = state.balance + n.get("money").asLong())
      case "MoneyWithdrawn" => state.copy(balance = state.balance - n.get("money").asLong())
      case "OwnerUpdated_V2" =>
        state.copy(firstName = n.get("owner").get("firstName").asText(),
          lastName = n.get("owner").get("lastName").asText())
      case "Invalidated" | "NoOp" => state
      case other => sys.error(s"unknown event kind $other")
    }
  }

  def encodeState(a: AccountV2): String = {
    val o = Codec.obj()
    o.put("status", a.status); o.put("balance", a.balance)
    val owner = Codec.obj()
    owner.put("firstName", a.firstName); owner.put("lastName", a.lastName)
    o.set("owner", owner)
    Codec.write(o)
  }

  def decodeState(body: String): AccountV2 = {
    val n = Codec.parse(body)
    AccountV2(n.get("status").asText(), n.get("balance").asLong(),
      n.get("owner").get("firstName").asText(), n.get("owner").get("lastName").asText())
  }

  def createdV2(money: Long, first: String, last: String): EventDetail = {
    val o = Codec.obj(); o.put("money", money)
    val owner = Codec.obj(); owner.put("firstName", first); owner.put("lastName", last)
    o.set("owner", owner)
    EventDetail("AccountCreated_V2", Codec.write(o))
  }
  def ownerUpdatedV2(first: String, last: String): EventDetail = {
    val o = Codec.obj()
    val owner = Codec.obj(); owner.put("firstName", first); owner.put("lastName", last)
    o.set("owner", owner)
    EventDetail("OwnerUpdated_V2", Codec.write(o))
  }

  /** M3 upcaster chain: decode-time lift of V1 payloads to V2 shapes. */
  def upcasters: Codec = new Codec()
    .registerUpcaster(Upcaster("AccountCreated", "AccountCreated_V2", (n: JsonNode) => {
      val (f, l) = splitName(n.get("owner").asText())
      val o = Codec.obj(); o.put("money", n.get("money").asLong())
      val owner = Codec.obj(); owner.put("firstName", f); owner.put("lastName", l)
      o.set("owner", owner); o
    }))
    .registerUpcaster(Upcaster("OwnerUpdated", "OwnerUpdated_V2", (n: JsonNode) => {
      val (f, l) = splitName(n.get("owner").asText())
      val o = Codec.obj()
      val owner = Codec.obj(); owner.put("firstName", f); owner.put("lastName", l)
      o.set("owner", owner); o
    }))
}
